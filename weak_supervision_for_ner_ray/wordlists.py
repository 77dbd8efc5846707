"""Frequent-word list used by the lightweight tagger.

The reference relies on spaCy's vocabulary for (a) lemma-based properness
checks and (b) token frequency ranks (`tok.rank`, annotations.py:1274-1277:
rank > 15000 or rank == 0 counts as *infrequent*).  We cannot ship spaCy
models, so the engine uses an explicit frequent-word list: a token's rank is
its 1-based position in this list, and any token not listed gets rank 20001
(the same convention the reference applies to out-of-vocabulary tokens).

The list contains function words and high-frequency English words, plus the
lexicon words that are high-frequency in news text (months, days, countries,
languages, nationality adjectives).  Order is stable → ranks are stable.
"""

from __future__ import annotations

from .constants import COUNTRIES, DAYS, LANGUAGES, MONTHS, NORPS

_CORE = """
the be to of and a in that have i it for not on with he as you do at this but
his by from they we say her she or an will my one all would there their what
so up out if about who get which go me when make can like time no just him
know take people into year your good some could them see other than then now
look only come its over think also back after use two how our work first well
way even new want because any these give day most us is was are been has had
were said did having may am shall might must should would could
man woman child world life hand part eye place case week company system
program question government number night point home water room mother area
money story fact month lot right study book job word business issue side kind
head house service friend father power hour game line end member law car city
community name president team minute idea body information nothing ago face
others level office door health person art war history party result change
morning reason research girl guy moment air teacher force education foot boy
age policy process music market sense nation plan college interest death
experience effect class control care field development role effort rate heart
drug show leader light voice wife whole police mind price report decision son
view relationship town road arm difference value building action model season
society tax director position player record paper space ground form event
official matter center couple site project activity star table court american
oil situation cost industry figure street image phone data picture practice
piece land product doctor wall patient worker news test movie north love
support technology south board international subject rule problem state
group country school student family percent million billion thousand dollar
euro pound bank share stock profit loss revenue sale growth quarter analyst
investor chief executive officer chairman spokesman minister secretary
department agency committee council election vote campaign candidate
economy trade deal agreement contract investment fund rates inflation
percentage according during between among within without across behind
beyond against through under above below before again further once here
where why both each few more most other some such only own same very too
can't don't won't it's he's she's that's there's
yesterday today tomorrow tonight currently recently lately soon later
earlier meanwhile however therefore moreover instead finally briefly
say said says saying go went gone going make made making take took taken
taking come came coming see saw seen seeing know knew known knowing get got
gotten getting give gave given giving find found finding tell told telling
ask asked asking seem seemed seeming feel felt feeling try tried trying
leave left leaving call called calling announce announced announces
report reported reports pay paid pays paying buy bought buys sell sold sells
rise rose risen fall fell fallen meet met meets visit visited visits launch
launched launches acquire acquired acquires agree agreed agrees plans planned
expects expected win won lose lost open opened close closed start started
begin began ended run ran held hold holds keep kept turn turned move moved
play played live lived believe believed bring brought happen happened write
wrote written provide provided sit sat stand stood carry carried
buyer seller retailer customer consumer shopper maker owner holder partner
rival supplier competitor employee employer manager founder client reader
viewer listener speaker winner loser critic expert analysts editor writer
""".split()


def _dedup(seq):
    seen = set()
    out = []
    for w in seq:
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


COMMON_WORDS: list[str] = _dedup(
    [w.lower() for w in _CORE]
    + [w.lower() for w in sorted(MONTHS | DAYS)]
    + [w.lower() for w in sorted(COUNTRIES) if " " not in w]
    + [w.lower() for w in sorted(LANGUAGES) if " " not in w]
    + [w.lower() for w in sorted(NORPS) if " " not in w]
)

# token -> 1-based rank
WORD_RANKS: dict[str, int] = {w: i + 1 for i, w in enumerate(COMMON_WORDS)}

OOV_RANK = 20001          # reference convention: rank 0 (OOV) -> 20001
INFREQUENT_CUTOFF = 15000  # annotations.py:1277

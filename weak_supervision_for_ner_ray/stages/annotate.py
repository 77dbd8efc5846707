"""Ray Data stages for the annotation pipeline.

Stage 1 (:class:`TurnAnnotateStage`) is a stateful actor-pool ``map_batches``
stage: the LF bank (gazetteer tries, heuristic model, compiled patterns) is
built ONCE per actor in ``__init__`` from a ``ray.put`` broadcast of the
name lists, then applied per zero-copy Arrow batch.  It is embarrassingly
parallel — no grouping required (SURVEY.md §3 EP1).

Stage 2 (:func:`conv_annotate_group`) runs inside
``groupby("conv_id").map_groups`` — the one explicit shuffle of the
annotation pipeline — and adds the conversation-scoped sources
(doc_history, doc_majority_*) with turns restored to stable
(conv_id, turn_idx) order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..sources.registry import LFBank
from ..tokenizer import make_doc
from .encode import MENTION_TYPE, MentionsBuilder, mentions_to_layers

ANNOTATED_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("n_tokens", pa.int32()),
    ("mentions", pa.list_(MENTION_TYPE)),
])


def _get_broadcast(ref_or_value):
    if isinstance(ref_or_value, ray.ObjectRef):
        return ray.get(ref_or_value)
    return ref_or_value


class TurnAnnotateStage:
    """Actor-pool stage: text -> turn-level mentions (nested column)."""

    def __init__(self, bank_inputs):
        """``bank_inputs``: (gazetteers, first_names) or an ObjectRef to it —
        broadcast once, materialised once per actor."""
        gazetteers, first_names = _get_broadcast(bank_inputs)
        self.bank = LFBank(gazetteers, first_names)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tokens = []
        builder = MentionsBuilder()
        for text in texts:
            doc, layers = self.bank.annotate_turn(text)
            n_tokens.append(len(doc))
            builder.add_layers(layers)
        return pa.table({
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "role": batch.column("role"),
            "text": batch.column("text"),
            "n_tokens": pa.array(n_tokens, pa.int32()),
            "mentions": builder.finish(),
        })


class ConvAnnotateStage:
    """Grouped stage: add doc-level sources over whole conversations.

    Used with ``ds.groupby("conv_id").map_groups(...)``; each call receives
    every turn of one conversation.  Turns are sorted by ``turn_idx`` inside
    the group (the input arrives shuffled) so order-sensitive history
    semantics hold ("first mention wins", annotations.py:1117).
    """

    def __init__(self, bank_inputs):
        gazetteers, first_names = _get_broadcast(bank_inputs)
        self.bank = LFBank(gazetteers, first_names)

    def __call__(self, group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("turn_idx", "ascending")])
        group = group.take(order)
        texts = group.column("text").to_pylist()
        mention_lists = group.column("mentions").to_pylist()
        turn_idxs = group.column("turn_idx").to_pylist()

        docs = [make_doc(t) for t in texts]
        layers_list = [mentions_to_layers(m) for m in mention_lists]
        self.bank.finish_conversation(turn_idxs, docs, layers_list)

        builder = MentionsBuilder()
        for layers in layers_list:
            builder.add_layers(layers)
        return pa.table({
            "conv_id": group.column("conv_id"),
            "turn_idx": group.column("turn_idx"),
            "role": group.column("role"),
            "text": group.column("text"),
            "n_tokens": group.column("n_tokens"),
            "mentions": builder.finish(),
        })


def annotate_pipeline(turns, bank_inputs_ref, *, concurrency=None,
                      batch_size: int = 256):
    """turns Dataset -> fully annotated Dataset (turn + conversation level).

    ``bank_inputs_ref``: ``ray.put((gazetteers, first_names))`` — passed by
    reference so every actor reads the same broadcast object instead of
    re-shipping the lists per task.
    """
    from .util import default_concurrency
    concurrency = default_concurrency(concurrency)
    annotated = turns.map_batches(
        TurnAnnotateStage,
        fn_constructor_args=(bank_inputs_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    return annotated.groupby("conv_id").map_groups(
        ConvAnnotateStage,
        fn_constructor_args=(bank_inputs_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

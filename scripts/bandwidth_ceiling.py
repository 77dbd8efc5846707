"""Measure this host's core-scaling ceiling for the E-step access pattern.

Runs the EM inner loop (no Ray, plain multiprocessing, one equal shard per
process) at two process counts and reports aggregate throughput + the
implied maximum achievable scaling efficiency.  On a single socket the
E-step's gather/scatter traffic over the 2 MB emission tables and
sufficient-statistic arrays saturates the shared memory bus well before 32
cores — this script quantifies that hardware ceiling so `bench.py
--scaling` results can be read against it.  On a real multi-node cluster
each node brings its own memory bus, so N→4N *node* scaling is not subject
to this cap.

Usage: python scripts/bandwidth_ceiling.py [lo=8] [hi=32]
"""

import multiprocessing as mp
import json
import sys
import time

sys.path.insert(0, "/root/repo")

TURNS_PER_PROC = 3000


def _make_data(seed):
    import numpy as np
    rng = np.random.default_rng(seed)
    n_turns = TURNS_PER_PROC
    n_tokens = rng.integers(4, 30, n_turns)
    pairs_per = (n_tokens * 3.5).astype(int)
    offs = np.concatenate([[0], np.cumsum(pairs_per)])
    o_t = np.concatenate([rng.integers(0, n, p)
                          for n, p in zip(n_tokens, pairs_per)])
    total = offs[-1]
    return (n_tokens, offs, o_t, rng.integers(0, 42, total),
            rng.integers(1, 77, total), rng.random(total) * 0.9 + 0.1)


def work(seed):
    import numpy as np

    from weak_supervision_for_ner_ray.state import hmm
    from weak_supervision_for_ner_ray.state.hmm import (SuffStats, TurnObs,
                                                        init_params_from_counts)
    K, S = hmm.N_STATES, hmm.N_SOURCES
    oc = np.zeros((S, K))
    oc[:, 0] = 10000
    params = init_params_from_counts(np.zeros(K), np.zeros((K, K)), oc,
                                     seed=1)
    nt, offs, o_t, o_s, o_state, o_conf = _make_data(seed)
    stats = SuffStats()
    for i in range(len(nt)):
        obs = TurnObs(int(nt[i]))
        for j in range(offs[i], offs[i + 1]):
            d = obs.fired.setdefault((int(o_t[j]), int(o_s[j])), {})
            st = int(o_state[j])
            d[st] = d.get(st, 0.0) + float(o_conf[j])
        hmm.accumulate(obs, params, stats)
    return stats.logprob


def run(nproc: int) -> float:
    t0 = time.time()
    with mp.Pool(nproc) as pool:
        pool.map(work, range(nproc))
    dt = time.time() - t0
    return nproc * TURNS_PER_PROC / dt     # aggregate turns/s


if __name__ == "__main__":
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    run(lo)                                # warm imports
    tput_lo = run(lo)
    tput_hi = run(hi)
    ceiling = (tput_hi / tput_lo) / (hi / lo)
    print(json.dumps({
        "metric": f"estep_core_scaling_ceiling_{lo}_to_{hi}",
        "turns_per_sec_lo": round(tput_lo),
        "turns_per_sec_hi": round(tput_hi),
        "hardware_ceiling_efficiency": round(ceiling, 3),
    }))

"""EMShard dedup + batched-kernel parity vs the sequential per-turn path."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from weak_supervision_for_ner_ray.stages.em_actors import (EMShard,
                                                           shard_estep,
                                                           shard_init_counts)
from weak_supervision_for_ner_ray.stages.encode import ObsRows
from weak_supervision_for_ner_ray.state import hmm
from weak_supervision_for_ner_ray.state.hmm import (SuffStats,
                                                    init_params_from_counts)


def _obs_table(seed=7, n_turns=60, dup_every=3):
    """Flat observation table with heavy duplication and multi-label pairs."""
    rng = np.random.default_rng(seed)
    rows = {"n_tokens": [], "o_t": [], "o_s": [], "o_state": [], "o_conf": []}
    patterns = []
    for _ in range(max(2, n_turns // dup_every)):
        T = int(rng.integers(2, 12))
        n_pairs = int(rng.integers(1, 8))
        t = rng.integers(0, T, n_pairs)
        s = rng.integers(0, hmm.N_SOURCES, n_pairs)
        # a few multi-label observations: duplicate (t, s) with new state
        st = rng.integers(1, hmm.N_STATES, n_pairs)
        cf = rng.uniform(0.3, 1.0, n_pairs).round(3)
        patterns.append((T, t, s, st, cf))
    fps = []
    for i in range(n_turns):
        T, t, s, st, cf = patterns[i % len(patterns)]
        rows["n_tokens"].append(T)
        rows["o_t"].append(t.astype(np.int32))
        rows["o_s"].append(s.astype(np.int16))
        rows["o_state"].append(st.astype(np.int8))
        rows["o_conf"].append(cf.astype(np.float32))
        # obs_fp contract: equal iff the observation pattern is equal —
        # the pattern index serves exactly that role here
        fps.append(i % len(patterns))
    return pa.table({
        "obs_fp": pa.array(fps, pa.int64()),
        "n_tokens": pa.array(rows["n_tokens"], pa.int32()),
        "o_t": pa.array([x.tolist() for x in rows["o_t"]],
                        pa.list_(pa.int32())),
        "o_s": pa.array([x.tolist() for x in rows["o_s"]],
                        pa.list_(pa.int16())),
        "o_state": pa.array([x.tolist() for x in rows["o_state"]],
                            pa.list_(pa.int8())),
        "o_conf": pa.array([x.tolist() for x in rows["o_conf"]],
                           pa.list_(pa.float32())),
    })


def _params(seed=3):
    K, S = hmm.N_STATES, hmm.N_SOURCES
    obs_c = np.zeros((S, K))
    obs_c[:, 0] = 10000.0
    return init_params_from_counts(np.zeros(K), np.zeros((K, K)), obs_c,
                                   seed=seed)


def test_emshard_dedup_estep_parity(ray_session, tmp_path):
    tbl = _obs_table()
    f = str(tmp_path / "obs.parquet")
    pq.write_table(tbl, f)
    p = _params()

    shard = EMShard.remote([(f, None)])
    assert ray.get(shard.n_turns.remote()) == tbl.num_rows

    got = shard_estep([shard], p)

    exp = SuffStats()
    rows = ObsRows(tbl)
    for i in range(len(rows)):
        hmm.accumulate(rows.turnobs(i), p, exp)

    assert got.n_seqs == exp.n_seqs
    assert abs(got.logprob - exp.logprob) < 1e-6
    assert np.abs(got.start - exp.start).max() < 1e-8
    assert np.abs(got.trans - exp.trans).max() < 1e-7
    assert np.abs(got.obs - exp.obs).max() < 1e-7
    ray.kill(shard)


def test_emshard_dedup_init_counts_parity(ray_session, tmp_path):
    from weak_supervision_for_ner_ray.stages.encode import obs_argmax_states
    from weak_supervision_for_ner_ray.state.hmm import BEST_COVERAGE_INDEX

    tbl = _obs_table(seed=11)
    f = str(tmp_path / "obs.parquet")
    pq.write_table(tbl, f)
    shard = EMShard.remote([(f, None)])
    init, trans, obs = shard_init_counts([shard])

    K, S = hmm.N_STATES, hmm.N_SOURCES
    einit = np.zeros(K)
    etrans = np.zeros((K, K))
    eobs = np.zeros((S, K))
    rows = ObsRows(tbl)
    for i in range(len(rows)):
        o = rows.turnobs(i)
        if o.n_tokens == 0:
            continue
        states = obs_argmax_states(o, BEST_COVERAGE_INDEX)
        einit[states[0]] += 1
        if o.n_tokens > 1:
            np.add.at(etrans, (states[:-1], states[1:]), 1)
        eobs[:, 0] += o.n_tokens
        for (t, s), dist in o.fired.items():
            eobs[s, 0] -= 1.0
            for state, conf in dist.items():
                eobs[s, state] += conf
    assert np.abs(init - einit).max() < 1e-9
    assert np.abs(trans - etrans).max() < 1e-9
    assert np.abs(obs - eobs).max() < 1e-9
    ray.kill(shard)


def test_weighted_accumulate_equals_repeated():
    p = _params()
    o = hmm.TurnObs(6)
    o.add_span(hmm.BEST_COVERAGE_INDEX, 1, 3, "PERSON", 1.0)
    s_rep = SuffStats()
    for _ in range(5):
        hmm.accumulate(o, p, s_rep)
    s_w = SuffStats()
    hmm.accumulate(o, p, s_w, weight=5.0)
    assert s_rep.n_seqs == s_w.n_seqs == 5
    assert abs(s_rep.logprob - s_w.logprob) < 1e-9
    assert np.abs(s_rep.obs - s_w.obs).max() < 1e-9
    assert np.abs(s_rep.trans - s_w.trans).max() < 1e-9


def test_emshard_streaming_mode_parity(ray_session, tmp_path):
    """A shard over budget streams row groups per pass and produces the
    identical partial as the resident path."""
    tbl = _obs_table(seed=21, n_turns=80)
    f = str(tmp_path / "obs.parquet")
    pq.write_table(tbl, f, row_group_size=16)
    p = _params()

    resident = EMShard.remote([(f, None)], None)
    streaming = EMShard.remote([(f, None)], 1)     # 1 byte -> must stream
    assert ray.get(streaming.n_turns.remote()) == tbl.num_rows

    a = shard_estep([resident], p)
    b = shard_estep([streaming], p)
    assert a.n_seqs == b.n_seqs
    assert abs(a.logprob - b.logprob) < 1e-8
    assert np.abs(a.obs - b.obs).max() < 1e-9
    assert np.abs(a.trans - b.trans).max() < 1e-9

    ia = shard_init_counts([resident])
    ib = shard_init_counts([streaming])
    for x, y in zip(ia, ib):
        assert np.abs(x - y).max() < 1e-9
    ray.kill(resident)
    ray.kill(streaming)


def test_emshard_repeated_estep_identical(ray_session, tmp_path):
    """The persistent per-actor EmisStatsBuffer must not leak state across
    passes: repeated esteps with the same params are bit-identical, and a
    pass after a different-params pass matches a fresh actor's result."""
    tbl = _obs_table(seed=23)
    f = str(tmp_path / "obs.parquet")
    pq.write_table(tbl, f)
    p1 = _params(seed=3)
    p2 = _params(seed=4)

    shard = EMShard.remote([(f, None)])
    a = shard_estep([shard], p1)
    _ = shard_estep([shard], p2)       # interleave different params
    b = shard_estep([shard], p1)
    fresh = EMShard.remote([(f, None)])
    c = shard_estep([fresh], p1)
    for x in (b, c):
        assert x.n_seqs == a.n_seqs
        assert abs(x.logprob - a.logprob) < 1e-12
        assert np.abs(x.obs - a.obs).max() == 0.0
        assert np.abs(x.trans - a.trans).max() == 0.0
        assert np.abs(x.start - a.start).max() == 0.0
    ray.kill(shard)
    ray.kill(fresh)


def test_emis_buffer_reset_discards_buffered_rows():
    buf = hmm.EmisStatsBuffer()
    g_s = np.array([0], np.int64)
    post_g = np.ones((1, hmm.N_STATES))
    keys = np.array([0], np.int64)
    cp = np.ones((1, hmm.N_STATES))
    buf.add(g_s, post_g, keys, cp)
    buf.reset()
    st = SuffStats()
    buf.apply(st)
    assert np.abs(st.obs).max() == 0.0


def test_dedup_rows_verifies_content_on_fp_collision():
    """A 63-bit obs_fp collision between two DIFFERENT patterns must not
    merge their statistics: _dedup_rows verifies byte-equality within
    each fp group (ADVICE r3)."""
    from weak_supervision_for_ner_ray.stages.em_actors import _dedup_rows

    tbl = _obs_table(seed=5, n_turns=12, dup_every=3)
    # forge a collision: give every row the same fingerprint
    tbl = tbl.set_column(0, "obs_fp",
                         pa.array([7] * tbl.num_rows, pa.int64()))
    rows = ObsRows(tbl)
    fp = tbl.column("obs_fp").to_numpy(zero_copy_only=False)
    idx, cnt = _dedup_rows(fp, rows)
    # 4 distinct patterns repeated 3x each -> 4 representatives, weight 3
    assert len(idx) == 4
    assert sorted(cnt.tolist()) == [3, 3, 3, 3]
    assert cnt.sum() == tbl.num_rows
    # representatives must be the first occurrence of each pattern
    assert sorted(idx.tolist()) == [0, 1, 2, 3]


def test_dedup_rows_matches_unique_when_no_collision():
    """On honest fingerprints the result is identical to the previous
    unique-by-fp implementation (same order, same weights)."""
    from weak_supervision_for_ner_ray.stages.em_actors import _dedup_rows

    tbl = _obs_table(seed=9, n_turns=30, dup_every=3)
    rows = ObsRows(tbl)
    fp = tbl.column("obs_fp").to_numpy(zero_copy_only=False)
    idx, cnt = _dedup_rows(fp, rows)
    _, exp_idx, exp_cnt = np.unique(fp, return_index=True,
                                    return_counts=True)
    assert idx.tolist() == exp_idx.tolist()
    assert cnt.tolist() == exp_cnt.tolist()

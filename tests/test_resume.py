"""Checkpoint/resume: killing EM after iteration k and resuming must give
the same parameters as an uninterrupted run (north rule)."""

import numpy as np

import ray.data as rd

from weak_supervision_for_ner_ray.pipelines.kg import annotate_turns
from weak_supervision_for_ner_ray.pipelines.train import train_hmm
from weak_supervision_for_ner_ray.state.checkpoints import CheckpointStore


def test_em_resume_matches_uninterrupted(ray_session, small_corpus,
                                         tmp_path_factory):
    turns, _, _ = small_corpus
    ds = rd.from_arrow(turns)
    wd_a = str(tmp_path_factory.mktemp("resume_a"))
    wd_b = str(tmp_path_factory.mktemp("resume_b"))

    annotated_a = annotate_turns(ds, wd_a)
    annotated_b = annotate_turns(ds, wd_b)

    # uninterrupted: 3 iterations
    p_full = train_hmm(annotated_a, wd_a, n_iter=3, seed=7)

    # interrupted: run 1 iteration, "crash", then resume to 3
    train_hmm(annotated_b, wd_b, n_iter=1, seed=7)
    store = CheckpointStore(wd_b)
    it, _, history, _ = store.latest()
    assert it == 1 and len(history) == 1
    p_resumed = train_hmm(annotated_b, wd_b, n_iter=3, seed=7)

    assert np.allclose(p_full.startprob, p_resumed.startprob)
    assert np.allclose(p_full.transmat, p_resumed.transmat)
    assert np.allclose(p_full.emission_probs, p_resumed.emission_probs)


def test_checkpoint_files_layout(ray_session, small_corpus,
                                 tmp_path_factory):
    import os
    turns, _, _ = small_corpus
    ds = rd.from_arrow(turns)
    wd = str(tmp_path_factory.mktemp("ckpt"))
    annotated = annotate_turns(ds, wd)
    train_hmm(annotated, wd, n_iter=2, seed=7)
    files = sorted(os.listdir(os.path.join(wd, "checkpoints")))
    assert "em_iter_000.npz" in files
    assert "em_iter_002.npz" in files or "em_iter_001.npz" in files
    assert "em_meta.json" in files

"""Per-phase wall-time profile of the KG pipeline at a given CPU count.

Usage: python scripts/profile_phases.py [sf_dir] [num_cpus] [n_iter]
Prints one line per phase; used to attribute scaling losses (8 vs 32).
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import ray
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False

    from weak_supervision_for_ner_ray.data import (FIRST_NAMES,
                                                   builtin_gazetteers,
                                                   corpus_for_sf_dir)
    from weak_supervision_for_ner_ray.pipelines.kg import graph_tables
    from weak_supervision_for_ner_ray.pipelines.train import train_hmm_sharded
    from weak_supervision_for_ner_ray.stages.annotate import annotate_pipeline
    from weak_supervision_for_ner_ray.stages.encode import encode_obs_batch
    from weak_supervision_for_ner_ray.stages.kg import make_decode_triple_fn
    from weak_supervision_for_ner_ray.stages.util import target_blocks

    corpus = corpus_for_sf_dir(sf_dir)
    turns_path = os.path.join(corpus, "turns.parquet")
    rd.read_parquet(turns_path).count()       # warm page cache

    # warmup (worker import + jit)
    import bench
    bench._warm_workers(sf_dir)

    wd = f"/tmp/wsner_prof/{os.getpid()}"
    shutil.rmtree(wd, ignore_errors=True)
    os.makedirs(wd, exist_ok=True)

    marks = []

    def mark(name, t0):
        dt = time.time() - t0
        marks.append((name, dt))
        print(f"PHASE {name}: {dt:.2f}s", flush=True)

    t0 = time.time()
    gaz = builtin_gazetteers()
    bank_ref = ray.put((gaz, FIRST_NAMES))
    nblocks = target_blocks()
    turns = rd.read_parquet(turns_path, override_num_blocks=nblocks)
    annotated = annotate_pipeline(turns, bank_ref, batch_size=256)
    obs_dir = os.path.join(wd, "obs")
    annotated.map_batches(encode_obs_batch, batch_format="pyarrow",
                          batch_size=256, zero_copy_batch=True) \
        .write_parquet(obs_dir, row_group_size=1024)
    mark("annotate+obs_write", t0)

    t0 = time.time()
    params = train_hmm_sharded(obs_dir, wd, n_iter=n_iter, seed=42,
                               verbose=bool(os.environ.get("PROF_VERBOSE")))
    mark(f"em_{n_iter}_iters", t0)

    t0 = time.time()
    obs_min = rd.read_parquet(
        obs_dir, columns=["conv_id", "turn_idx", "text", "n_tokens",
                          "o_t", "o_s", "o_state", "o_conf"],
        override_num_blocks=nblocks)
    params_ref = ray.put(params)
    gaz_ref = ray.put(gaz)
    tdir = os.path.join(wd, "decoded")
    obs_min.map_batches(make_decode_triple_fn(params_ref, gaz_ref),
                        batch_format="pyarrow", batch_size=256,
                        zero_copy_batch=True).write_parquet(tdir)
    mark("decode+triples_write", t0)

    t0 = time.time()
    import pyarrow.compute as pc

    def to_triples(b):
        import pyarrow as pa
        b = b.filter(pc.equal(b.column("kind"), "t"))
        return b.select(["conv_id", "turn_idx", "subj", "subj_label",
                         "pred", "obj", "obj_label", "subj_id", "obj_id",
                         "conf"])

    triples = rd.read_parquet(tdir).map_batches(
        to_triples, batch_format="pyarrow", zero_copy_batch=True)
    nodes, edges = graph_tables(triples)
    n_nodes = nodes.count()
    n_edges = edges.count()
    mark("graph_tables", t0)

    total = sum(dt for _, dt in marks)
    print(f"PHASE total: {total:.2f}s  (cpus={ncpu}, nodes={n_nodes}, "
          f"edges={n_edges})", flush=True)
    shutil.rmtree(wd, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

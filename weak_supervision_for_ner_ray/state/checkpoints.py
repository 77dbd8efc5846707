"""EM checkpointing: resumable sufficient-statistics / parameter snapshots.

Layout under ``<workdir>/checkpoints``::

    em_iter_000.npz   # parameters after initialisation (before EM)
    em_iter_001.npz   # parameters after EM iteration 1
    ...
    em_meta.json      # {"iters": [...logprob...], "done": bool}

``latest()`` lets a restarted driver continue mid-train (north rule:
"EM ... resume[s] mid-run from checkpointed sufficient statistics").
"""

from __future__ import annotations

import json
import os

from .hmm import HMMParams


class CheckpointStore:
    def __init__(self, workdir: str):
        self.dir = os.path.join(workdir, "checkpoints")
        os.makedirs(self.dir, exist_ok=True)
        self.meta_path = os.path.join(self.dir, "em_meta.json")

    def _path(self, it: int) -> str:
        return os.path.join(self.dir, "em_iter_%03d.npz" % it)

    def save(self, it: int, params: HMMParams, history: list[float],
             done: bool = False) -> None:
        tmp = self._path(it) + ".tmp.npz"
        params.save(tmp)
        os.replace(tmp, self._path(it))
        with open(self.meta_path + ".tmp", "w") as fd:
            json.dump({"history": history, "last_iter": it, "done": done},
                      fd)
        os.replace(self.meta_path + ".tmp", self.meta_path)

    def latest(self) -> tuple[int, HMMParams, list[float], bool] | None:
        if not os.path.exists(self.meta_path):
            return None
        with open(self.meta_path) as fd:
            meta = json.load(fd)
        it = meta["last_iter"]
        path = self._path(it)
        if not os.path.exists(path):
            return None
        return it, HMMParams.load(path), list(meta["history"]), \
            bool(meta.get("done"))

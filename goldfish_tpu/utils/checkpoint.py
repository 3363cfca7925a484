"""Optimization checkpoint / resume.

The reference has NO design-variable restart (SURVEY.md section 5:
output-only pvd snapshots + SNOPT print files). This build makes
checkpointing a first-class subsystem: every optimizer iteration can
atomically persist the design vector, warm-start displacement, iteration
counter and objective history, and an interrupted run resumes exactly.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

__all__ = ["Checkpointer"]


class Checkpointer:
    def __init__(self, path: str, every: int = 1):
        self.path = path
        self.every = max(int(every), 1)
        self._count = 0

    def save(self, design: dict, state=None, meta: dict | None = None):
        """Atomic snapshot (write-to-temp + rename)."""
        self._count += 1
        if self._count % self.every:
            return
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        payload = {f"design__{k}": np.asarray(v) for k, v in design.items()}
        if state is not None:
            payload["state"] = np.asarray(state)
        payload["meta"] = np.frombuffer(
            json.dumps(meta or {}).encode(), dtype=np.uint8)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.path) or ".",
                                   suffix=".npz.tmp")
        os.close(fd)
        try:
            with open(tmp, "wb") as f:
                np.savez(f, **payload)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    def load(self):
        """Returns (design dict, state or None, meta dict) or None."""
        if not os.path.exists(self.path):
            return None
        with np.load(self.path, allow_pickle=False) as z:
            design = {k[len("design__"):]: z[k] for k in z.files
                      if k.startswith("design__")}
            state = z["state"] if "state" in z.files else None
            meta = json.loads(bytes(z["meta"]).decode()) if "meta" in z.files \
                else {}
        return design, state, meta

    def attach(self, prob, state_box=None):
        """Wire into OptProblem.iter_callback (saves each iteration)."""
        it = [0]

        def cb(xdict, J):
            it[0] += 1
            self.save({k: np.asarray(v) for k, v in xdict.items()},
                      state=None if state_box is None else state_box[0],
                      meta={"iter": it[0], "J": float(J)})

        prob.iter_callback = cb
        return prob

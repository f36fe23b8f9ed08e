"""Per-stage checkpoint manifest: resumable index builds (SURVEY.md §4.6).

The reference's resilience story is "drop failed batch, keep going, report
at the end" (/root/reference/indexing.go:384-388, run.go:341-347). Ours is
stronger, as the north rule requires: every build stage materializes to its
own table directory and records a manifest entry with a config/input
fingerprint, row counts, timing and skew metrics. A restarted build skips
stages whose fingerprint matches (kill -9 mid-build -> rerun -> identical
index, already-done stages are not recomputed).

Stage writes go to a temp dir and are atomically renamed into place, so a
half-written stage never matches the fingerprint.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any


MANIFEST = "manifest.jsonl"


@dataclass
class Manifest:
    index_dir: str
    fingerprint: str  # hash of (config, input signature)
    entries: list[dict[str, Any]] = field(default_factory=list)

    @property
    def path(self) -> str:
        return os.path.join(self.index_dir, MANIFEST)

    def load(self) -> None:
        self.entries = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self.entries.append(json.loads(line))

    def is_done(self, stage: str, output_path: str | None = None) -> bool:
        """A stage counts as done only if the manifest says so AND its
        output still exists — a crash that lost the output (or a manual
        delete) forces a rebuild of exactly that stage."""
        recorded = any(
            e["stage"] == stage
            and e["status"] == "done"
            and e["fingerprint"] == self.fingerprint
            for e in self.entries
        )
        if not recorded:
            return False
        if output_path is not None and not os.path.exists(output_path):
            return False
        return True

    def record(self, stage: str, status: str = "done", **metrics: Any) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        entry = {
            "stage": stage,
            "status": status,
            "fingerprint": self.fingerprint,
            "wall_clock": time.time(),
            **metrics,
        }
        self.entries.append(entry)
        with open(self.path, "a") as f:
            f.write(json.dumps(entry) + "\n")


class StageTimer:
    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        self.secs = time.monotonic() - self.t0
        return False

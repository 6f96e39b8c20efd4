"""Checkpointed run layout: per-partition verdicts + violations, atomic, resumable.

The reference is one-shot — the report is written once at the very end and a
crash loses everything (extraction/main.py:296-304,325-336). The north_rule
requires the opposite: partition-keyed outputs with lineage + metrics so a
rerun skips finished partitions (SURVEY.md §4.1 checkpoint row).

Layout (one directory per partition, written to a tmp name then renamed —
rename is the atomic commit point):

    out_dir/
      run.json                      # config hash + partition plan (written once)
      partitions/p00000/
        verdict.json                # partition_id, passed, rows_checked,
                                    # violation_count, warning_count,
                                    # lineage {input_files, config_hash},
                                    # metrics {wall_s, ...},
                                    # stats_partials (b64 sketches, for global
                                    # merge on resume WITHOUT re-streaming)
        violations/*.parquet
      global/                       # cross-partition phase (uniqueness, drift)
        verdict.json
        violations/*.parquet
      report.json                   # merged, deterministic (no volatile fields)
"""

from __future__ import annotations

import json
import os
import shutil


class RunManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.part_root = os.path.join(out_dir, "partitions")
        os.makedirs(self.part_root, exist_ok=True)

    # -- run-level config ----------------------------------------------------
    def write_run_config(self, config: dict) -> None:
        path = os.path.join(self.out_dir, "run.json")
        if os.path.exists(path):
            old = json.load(open(path))
            if old.get("config_hash") != config.get("config_hash"):
                raise ValueError(
                    "resume with a different config: "
                    f"{old.get('config_hash')} != {config.get('config_hash')} "
                    "(delete the output dir to start fresh)"
                )
            # resume identifies partitions by pid name only, so a changed
            # partition plan or input set would silently mark old pids
            # complete and never validate the reassigned/new files — refuse,
            # exactly like the config-hash guard above
            for field in ("partitions", "input_files"):
                if field in old and old.get(field) != config.get(field):
                    raise ValueError(
                        f"resume with a different {field} "
                        "(delete the output dir to start fresh)"
                    )
            return
        self._atomic_json(path, config)

    # -- partitions ----------------------------------------------------------
    def partition_dir(self, partition_id: str) -> str:
        return os.path.join(self.part_root, partition_id)

    def _verdict_or_none(self, partition_id: str) -> dict | None:
        v = os.path.join(self.partition_dir(partition_id), "verdict.json")
        try:
            return json.load(open(v))
        except (OSError, json.JSONDecodeError):
            return None

    def is_complete(self, partition_id: str) -> bool:
        """True only for partitions that finished SUCCESSFULLY — a failed
        verdict (error-channel commit) is resumable: the next run retries the
        partition and overwrites the failure on success."""
        v = self._verdict_or_none(partition_id)
        return bool(v) and v.get("complete", False) and not v.get("failed", False)

    def has_verdict(self, partition_id: str) -> bool:
        """True for any committed verdict, failed or not (report scope)."""
        v = self._verdict_or_none(partition_id)
        return bool(v) and v.get("complete", False)

    def load_verdict(self, partition_id: str) -> dict:
        return json.load(open(os.path.join(self.partition_dir(partition_id), "verdict.json")))

    def commit_partition(self, partition_id: str, verdict: dict, tmp_dir: str) -> None:
        """Atomically promote a finished partition: tmp_dir (holding
        violations/ and verdict.json with complete=true) → partitions/<id>."""
        final = self.partition_dir(partition_id)
        if os.path.isdir(final):
            shutil.rmtree(final)
        verdict = dict(verdict, complete=True)
        self._atomic_json(os.path.join(tmp_dir, "verdict.json"), verdict)
        os.replace(tmp_dir, final)

    def completed_partitions(self) -> list[str]:
        """Partitions with a committed verdict, INCLUDING failed ones — the
        report must show failures as data; only resume skipping (is_complete)
        excludes them."""
        if not os.path.isdir(self.part_root):
            return []
        return sorted(p for p in os.listdir(self.part_root) if self.has_verdict(p))

    @staticmethod
    def _atomic_json(path: str, obj: dict) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=2, sort_keys=True)
        os.replace(tmp, path)

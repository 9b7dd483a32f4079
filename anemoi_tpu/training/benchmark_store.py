"""Commit-keyed benchmark regression store.

Equivalent of /root/reference/training/src/anemoi/training/diagnostics/benchmark_server.py
(BenchmarkServer :217, LocalBenchmarkServer :493, _find_latest_shared_commit :194,
track_accuracy_result :749): push metric values keyed by git commit, retrieve
them, and compare a new run against the latest ancestor commit that has stored
results.  The store is a plain JSON directory (one file per commit) so it can
live in CI artifacts or a shared filesystem.
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Dict, List, Optional


def current_commit(repo: str = ".") -> str:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"], cwd=repo, capture_output=True, text=True,
                check=True,
            ).stdout.strip()
        )
    except Exception:
        return "unknown"


def commit_ancestry(repo: str = ".", limit: int = 200) -> List[str]:
    try:
        out = subprocess.run(
            ["git", "log", f"-{limit}", "--format=%H"], cwd=repo,
            capture_output=True, text=True, check=True,
        ).stdout
        return out.split()
    except Exception:
        return []


class BenchmarkStore:
    def __init__(self, directory: str, repo: str = ".") -> None:
        self.directory = directory
        self.repo = repo
        os.makedirs(directory, exist_ok=True)

    def _path(self, commit: str) -> str:
        return os.path.join(self.directory, f"{commit}.json")

    def push(self, metrics: Dict[str, float], commit: Optional[str] = None) -> str:
        commit = commit or current_commit(self.repo)
        existing = self.get(commit) or {}
        existing.update(metrics)
        with open(self._path(commit), "w") as f:
            json.dump(existing, f, indent=1, sort_keys=True)
        return commit

    def get(self, commit: str) -> Optional[Dict[str, float]]:
        path = self._path(commit)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def find_latest_shared_commit(self, exclude_head: bool = True) -> Optional[str]:
        """Most recent ancestor commit with stored results (ref :194-216)."""
        ancestry = commit_ancestry(self.repo)
        if exclude_head and ancestry:
            ancestry = ancestry[1:]
        for commit in ancestry:
            if os.path.exists(self._path(commit)):
                return commit
        return None

    def compare(
        self, metrics: Dict[str, float], higher_is_better: bool = True
    ) -> Dict[str, Dict[str, float]]:
        """Compare metrics against the latest stored ancestor's values."""
        base_commit = self.find_latest_shared_commit()
        if base_commit is None:
            return {k: {"value": v, "baseline": None, "ratio": None} for k, v in metrics.items()}
        base = self.get(base_commit) or {}
        out = {}
        for k, v in metrics.items():
            b = base.get(k)
            ratio = (v / b) if (b not in (None, 0)) else None
            out[k] = {"value": v, "baseline": b, "ratio": ratio, "baseline_commit": base_commit}
        return out

"""Structured metrics for encode runs.

The reference's only observability is printf logging in hot loops
(SURVEY.md §5); here metrics are first-class: named counters/timers with
JSON and human reports, used by the CLI (--metrics) and the benchmark
harness.  Frames/s is the north-star number, so derived rates are
computed on demand.
"""

from __future__ import annotations

import json


class EncodeMetrics:
    def __init__(self) -> None:
        self._v: dict[str, float | int | str] = {}

    def set(self, key: str, value) -> None:
        self._v[key] = value

    def add(self, key: str, value: float) -> None:
        self._v[key] = self._v.get(key, 0.0) + value

    def get(self, key: str, default=None):
        return self._v.get(key, default)

    def derived(self) -> dict:
        d = dict(self._v)
        frames = d.get("frames")
        if frames:
            if d.get("encode_s"):
                d["encode_fps"] = frames / d["encode_s"]
            if d.get("stream_bytes"):
                d["bytes_per_frame"] = d["stream_bytes"] / frames
        return d

    def report(self) -> str:
        return json.dumps(self.derived(), indent=1, default=str)

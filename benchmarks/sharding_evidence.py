#!/usr/bin/env python3
"""Compiler-level evidence for the zero-collective sharding claim.

Lowers the sharded correct-mode step for mesh shapes on the 8-device
virtual CPU platform (same GSPMD partitioner as TPU), scans the compiled
HLO for communication ops, and records per-device cost_analysis
(flops / bytes accessed) against the unsharded step.  A perfectly
partitioned embarrassingly-parallel program shows ~1/n_devices of the
unsharded flops per device and zero collectives; that ratio is the
compiler's own statement of scaling efficiency, independent of the
virtual-CPU dispatch overhead that polluted BENCHMATRIX config 7's
wall-clock comparison (r4 VERDICT item 2).

Writes SHARDING_EVIDENCE_r05.json at the repo root.

Run: python benchmarks/sharding_evidence.py
(no JAX_PLATFORMS=cpu in the environment: under this container's
sitecustomize that initializes the CPU backend before this script can
set xla_force_host_platform_device_count; the in-process config switch
below initializes it lazily with 8 devices)
"""

import json
import os
import re
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

# switch platform BEFORE any backend query: even jax.default_backend()
# eagerly initializes the CPU client with 1 device, ignoring the flag
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from ec504_imageencoder_tpu.models.mpeg1 import (  # noqa: E402
    _jitted_correct_pipeline,
    quality_to_quant,
)
from ec504_imageencoder_tpu.parallel import mesh as mesh_lib  # noqa: E402
from ec504_imageencoder_tpu.parallel.sharded_encoder import (  # noqa: E402
    _sharded_pipeline,
)

COLLECTIVE_RE = (
    r"= \S+ (?:all-gather|all-reduce|collective-permute|all-to-all"
    r"|reduce-scatter|collective-broadcast)\("
)

B, H, W = 8, 256, 512
MSB = 2560
QUALITY = 45


def cost(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }


def main() -> None:
    intra_q, qscale = quality_to_quant(QUALITY)
    rgb = np.zeros((B, H, W, 3), np.uint8)

    base = _jitted_correct_pipeline(qscale, MSB).lower(rgb, intra_q).compile()
    base_cost = cost(base)

    out = {
        "inputs": {"batch": B, "height": H, "width": W, "quality": QUALITY,
                   "max_slice_bytes": MSB},
        "unsharded_per_device": base_cost,
        "meshes": [],
    }
    for shape in [(8, 1), (4, 2), (2, 4)]:
        mesh = mesh_lib.make_mesh(*shape)
        fn = _sharded_pipeline(mesh, qscale, MSB)
        compiled = fn.lower(rgb, intra_q).compile()
        hlo = compiled.as_text()
        colls = re.findall(COLLECTIVE_RE, hlo)
        c = cost(compiled)
        n_dev = shape[0] * shape[1]
        # per-device flops ratio vs the ideal 1/n_dev split: 1.0 = the
        # compiler partitioned the program with zero duplicated work
        ideal = base_cost["flops"] / n_dev
        out["meshes"].append({
            "mesh": {"data": shape[0], "rows": shape[1]},
            "collective_ops": len(colls),
            "collective_kinds": sorted(set(colls)),
            "per_device": c,
            "flops_ratio_vs_ideal": round(c["flops"] / ideal, 4) if ideal else None,
            "parallel_efficiency_flops": round(ideal / c["flops"], 4) if c["flops"] else None,
        })
        print(f"mesh {shape}: collectives={len(colls)} "
              f"flops/device={c['flops']:.3e} "
              f"(ideal {ideal:.3e})", file=sys.stderr)

    path = os.path.join(REPO, "SHARDING_EVIDENCE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["meshes"], indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""One-process TPU checks that complement the CPU test suite:

1. q=85 cross-hardware determinism: the f32 MXU DCT at
   Precision.HIGHEST — is the TPU stream byte-identical to the host
   oracle, and if not, is the decoded PSNR equal (the documented
   guarantee, ops/dct.py)?
2. q=45 AAN path: must be byte-identical on chip (integer arithmetic).
3. Sanitizer smoke on real hardware: EC504_DEBUG_CHECKS=1 (spawned as a
   subprocess because the knob is trace-time) must (a) keep a healthy
   encode byte-identical and (b) stay silent.

Run on the chip: python benchmarks/tpu_extras.py
"""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    import jax

    from ec504_imageencoder_tpu.models.decoder import decode_es_fast, psnr
    from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
    from ec504_imageencoder_tpu.syntax import headers

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    z = np.load(REPO / "tests/golden/fixture_rgb.npz")
    frames = np.stack([z["0"], z["1"]])[:, :128, :192]
    out = {"device": str(jax.devices()[0])}

    for q, key in ((45, "q45_aan"), (85, "q85_f32dct")):
        host = MPEG1IntraEncoder(quality=q, backend="numpy").encode(frames)
        tpu = MPEG1IntraEncoder(quality=q, backend="jax").encode(frames)
        same = bool(host == tpu)
        rec = {"byte_identical": same}
        if not same:
            dh = decode_es_fast(host + headers.sequence_end())
            dt = decode_es_fast(tpu + headers.sequence_end())
            ph = np.mean([psnr(frames[i], dh[i]) for i in range(len(dh))])
            pt = np.mean([psnr(frames[i], dt[i]) for i in range(len(dt))])
            rec.update({
                "psnr_host_db": round(float(ph), 3),
                "psnr_tpu_db": round(float(pt), 3),
                "psnr_equal_50mdB": bool(abs(ph - pt) < 0.05),
            })
        out[key] = rec
        print(f"{key}: {rec}", file=sys.stderr)

    # sanitizer on real hardware (trace-time knob -> subprocess)
    code = (
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        "from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder\n"
        "z = np.load(%r)\n"
        "frames = np.stack([z['0'], z['1']])[:, :128, :192]\n"
        "es = MPEG1IntraEncoder(quality=45, backend='jax').encode(frames)\n"
        "sys.stdout.buffer.write(es)\n" % str(REPO / "tests/golden/fixture_rgb.npz")
    )
    p = subprocess.run([sys.executable, "-c", code],
                       env=dict(os.environ, EC504_DEBUG_CHECKS="1"),
                       capture_output=True, timeout=1800)
    clean = MPEG1IntraEncoder(quality=45, backend="numpy").encode(frames)
    out["sanitizer_on_chip"] = {
        "rc": p.returncode,
        "byte_identical_to_host": bool(p.stdout == clean),
    }
    print(f"sanitizer: rc={p.returncode} "
          f"identical={p.stdout == clean}", file=sys.stderr)
    if p.returncode != 0:
        print(p.stderr.decode()[-2000:], file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

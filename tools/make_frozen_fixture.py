"""Generate the FROZEN end-to-end decode fixtures under tests/fixtures/.

Run ONCE (round 4); the outputs are committed and never regenerated —
that is the point: tests/test_frozen_fixture.py decodes the committed
int8 soft-symbol stream and compares VCDUs against the committed payload
bytes, so a joint drift of tx.py and the decode chain can no longer pass
silently (round-3 VERDICT item 1).

If this script is ever re-run, the test's frozen SHA-256 constants will
fail loudly — update them only with a written justification in the commit.
"""

from __future__ import annotations

import hashlib
import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xritdemod_tpu import tx  # noqa: E402

FIXDIR = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"

SPECS = {
    "lrit": dict(
        n=12, scid=13, vcid=5, counter0=1000, seed=20260820,
        amp=0.82, noise=0.12, lead=2345, phase180=True, lrit=True,
    ),
    "hrit": dict(
        n=8, scid=7, vcid=21, counter0=5, seed=4242,
        amp=0.9, noise=0.1, lead=901, phase180=False, lrit=False,
    ),
}


def main() -> None:
    FIXDIR.mkdir(parents=True, exist_ok=True)
    meta = {}
    for name, s in SPECS.items():
        rng = np.random.default_rng(s["seed"])
        vcdus = tx.make_vcdus(
            s["n"], scid=s["scid"], vcid=s["vcid"], counter0=s["counter0"],
            rng=rng,
        )
        soft = tx.encode_stream(
            vcdus, lrit=s["lrit"], amp=s["amp"], noise=s["noise"],
            lead=s["lead"], phase180=s["phase180"], rng=rng,
        )
        wire = tx.soft_to_int8(soft)
        soft_path = FIXDIR / f"{name}_soft_int8.bin"
        vcdu_path = FIXDIR / f"{name}_vcdus.bin"
        soft_path.write_bytes(wire.tobytes())
        vcdu_path.write_bytes(vcdus.tobytes())
        meta[name] = {
            **{k: v for k, v in s.items()},
            "soft_sha256": hashlib.sha256(wire.tobytes()).hexdigest(),
            "vcdu_sha256": hashlib.sha256(vcdus.tobytes()).hexdigest(),
            "soft_len": int(wire.size),
            "n_vcdus": int(vcdus.shape[0]),
        }
        print(name, meta[name]["soft_sha256"], meta[name]["vcdu_sha256"])
    (FIXDIR / "meta.json").write_text(json.dumps(meta, indent=2) + "\n")


if __name__ == "__main__":
    main()

"""Record the torchvision-resnet34 key/shape/checksum fixture.

Writes tests/fixtures/resnet34_torchvision_keys.json: every state-dict key of
``torchvision.models.resnet34()`` with its shape, dtype, and the sha256 of the
deterministic synthetic values used by the import-pipeline tests. With
--emit-npz it also runs the full conversion (synthetic torch state dict ->
convert_state_dict -> save_npz), i.e. the executable walkthrough of the
pretrained-trunk import.

Usage:
    python tools/make_resnet34_fixture.py [--emit-npz /tmp/resnet34.npz]
"""

import argparse
import hashlib
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from geomapnet_tpu.models.torchvision_layout import (
    resnet34_state_shapes,
    synthetic_resnet34_state_dict,
)

FIXTURE = pathlib.Path(__file__).resolve().parent.parent / (
    "tests/fixtures/resnet34_torchvision_keys.json"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit-npz", type=str, default=None)
    args = ap.parse_args()

    sd = synthetic_resnet34_state_dict(torch_tensors=False)
    record = {}
    for key, shape in resnet34_state_shapes().items():
        v = sd[key]
        record[key] = {
            "shape": list(shape),
            "dtype": str(v.dtype),
            "sha256": hashlib.sha256(np.ascontiguousarray(v).tobytes()).hexdigest(),
        }
    FIXTURE.parent.mkdir(parents=True, exist_ok=True)
    FIXTURE.write_text(json.dumps(record, indent=1) + "\n")
    print(f"wrote {FIXTURE} ({len(record)} keys)")

    if args.emit_npz:
        from geomapnet_tpu.models.torch_import import convert_state_dict, save_npz

        variables = convert_state_dict(
            synthetic_resnet34_state_dict(torch_tensors=True), strict=True
        )
        save_npz(args.emit_npz, variables)
        print(f"wrote {args.emit_npz}")


if __name__ == "__main__":
    main()

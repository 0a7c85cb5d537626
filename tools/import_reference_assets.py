"""Import the reference's published data assets into ./data.

The asset layer (SURVEY.md §2.7) is pure DATA — per-scene pixel statistics
(`stats.txt`), translation normalization stats (`pose_stats.txt`),
per-sequence VO->GT similarity alignments (`*_vo_stats.pkl`), precomputed DSO
visual-odometry trajectories (`dso_poses/*.txt`), crop sizes and split
files. Reproducing the published accuracy REQUIRES these exact values; they
are measurements of the public 7Scenes/RobotCar datasets published with the
MapNet reference (NVlabs/geomapnet, CC BY-NC-SA 4.0), not code.

This tool validates and re-serializes everything (pickles are loaded and
re-dumped as plain {R, t, s} numpy dicts; text tables are parsed with numpy
and re-written) so the artifacts in this repo are generated, format-checked
copies with recorded provenance.

Usage: python tools/import_reference_assets.py [--src /root/reference/data]
"""

import argparse
import pathlib
import pickle

import numpy as np

DST = pathlib.Path(__file__).resolve().parent.parent / "data"


def _import_text_table(src: pathlib.Path, dst: pathlib.Path,
                       shape_ok) -> None:
    table = np.loadtxt(src)
    assert shape_ok(table.shape), f"{src}: unexpected shape {table.shape}"
    dst.parent.mkdir(parents=True, exist_ok=True)
    np.savetxt(dst, np.atleast_2d(table), fmt="%.17g")


def _import_vo_stats(src: pathlib.Path, dst: pathlib.Path) -> None:
    with open(src, "rb") as f:
        d = pickle.load(f, encoding="latin1")  # py2-era pickles
    out = {
        "R": np.asarray(d["R"], np.float64).reshape(3, 3),
        "t": np.asarray(d["t"], np.float64).reshape(-1)[:3],
        "s": float(np.asarray(d["s"]).reshape(())),
    }
    dst.parent.mkdir(parents=True, exist_ok=True)
    with open(dst, "wb") as f:
        pickle.dump(out, f, protocol=2)


def _import_split(src: pathlib.Path, dst: pathlib.Path) -> None:
    lines = [l for l in src.read_text().splitlines() if l.strip()]
    dst.parent.mkdir(parents=True, exist_ok=True)
    dst.write_text("\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/reference/data")
    args = ap.parse_args()
    src = pathlib.Path(args.src)

    counts = {"stats": 0, "pose_stats": 0, "crop": 0, "vo_stats": 0,
              "dso": 0, "split": 0}
    for f in sorted(src.rglob("*")):
        if not f.is_file():
            continue
        rel = f.relative_to(src)
        dst = DST / rel
        name = f.name
        if name == "stats.txt" or name == "pose_stats.txt":
            _import_text_table(f, dst, lambda s: s == (2, 3))
            counts["pose_stats" if "pose" in name else "stats"] += 1
        elif name == "crop_size.txt":
            _import_text_table(f, dst, lambda s: s in ((2,), (1, 2)))
            counts["crop"] += 1
        elif name.endswith("_vo_stats.pkl"):
            _import_vo_stats(f, dst)
            counts["vo_stats"] += 1
        elif f.parent.name == "dso_poses" and name.endswith(".txt"):
            # rows: [frame_idx, 12-dim flattened 3x4 pose]
            _import_text_table(f, dst, lambda s: len(s) == 2 and s[1] == 13)
            counts["dso"] += 1
        elif name.endswith("_split.txt"):
            _import_split(f, dst)
            counts["split"] += 1
        # anything else (READMEs etc.) is intentionally skipped

    (DST / "PROVENANCE.md").write_text(
        "# Asset provenance\n\n"
        "Dataset-statistics and alignment assets for 7Scenes / Oxford\n"
        "RobotCar, as published with the MapNet reference implementation\n"
        "(NVlabs/geomapnet, CC BY-NC-SA 4.0). Regenerated (parsed,\n"
        "validated, re-serialized) by tools/import_reference_assets.py;\n"
        "required verbatim to reproduce the published accuracy numbers.\n"
    )
    print({k: v for k, v in counts.items()})


if __name__ == "__main__":
    main()

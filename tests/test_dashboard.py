"""Live dashboard: JSONL parsing, experiment discovery, HTTP serving.

Covers the visdom-replacement path (utils/dashboard.py): torn-tail-line
tolerance (a live Trainer is appending while we read), per-kind thinning,
experiment discovery for both layouts, and the live-update loop (a row
appended after the first poll shows up in the next).
"""

import json
import threading
import urllib.request

from geomapnet_tpu.utils.dashboard import (
    list_experiments,
    make_server,
    read_metrics,
)


def write_rows(path, n_train=5, n_val=2):
    rows = []
    for i in range(n_train):
        rows.append({"kind": "train", "step": i, "epoch": 0,
                     "loss": 1.0 - 0.1 * i, "lr": 1e-4,
                     "sax": 0.0, "saq": -3.0, "srx": 0.0, "srq": -3.0,
                     "data_time": 0.01, "batch_time": 0.05})
    for i in range(n_val):
        rows.append({"kind": "val", "step": i * 2, "epoch": i, "loss": 0.9})
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text("".join(json.dumps(r) + "\n" for r in rows))
    return rows


def test_read_metrics_skips_torn_tail(tmp_path):
    p = tmp_path / "metrics.jsonl"
    write_rows(p, n_train=3, n_val=1)
    with open(p, "a") as f:
        f.write('{"kind": "train", "step": 99, "loss"')  # mid-write tail
    rows = read_metrics(p)
    assert len(rows) == 4
    assert all(r["step"] != 99 for r in rows)


def test_read_metrics_thins_per_kind_keeping_ends(tmp_path):
    p = tmp_path / "metrics.jsonl"
    with open(p, "w") as f:
        for i in range(500):
            f.write(json.dumps({"kind": "train", "step": i, "loss": i}) + "\n")
        f.write(json.dumps({"kind": "val", "step": 250, "loss": 0.5}) + "\n")
    rows = read_metrics(p, limit=100)
    train = [r for r in rows if r["kind"] == "train"]
    assert len(train) <= 100
    assert train[0]["step"] == 0 and train[-1]["step"] == 499
    # sparse kinds survive thinning untouched
    assert sum(r["kind"] == "val" for r in rows) == 1
    assert read_metrics(tmp_path / "absent.jsonl") == []


def test_list_experiments_both_layouts(tmp_path):
    write_rows(tmp_path / "exp_a" / "metrics.jsonl")
    write_rows(tmp_path / "exp_b" / "metrics.jsonl")
    found = list_experiments(tmp_path)
    assert list(found) == ["exp_a", "exp_b"]
    # pointing straight at one experiment dir also works
    found_one = list_experiments(tmp_path / "exp_a")
    assert list(found_one) == ["exp_a"]


def test_server_serves_page_and_live_data(tmp_path):
    mpath = tmp_path / "run1" / "metrics.jsonl"
    write_rows(mpath, n_train=4, n_val=1)
    srv = make_server(tmp_path, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        page = urllib.request.urlopen(f"{base}/").read().decode()
        # charts render client-side; page carries the script + palette vars
        assert "geomapnet_tpu training" in page
        assert "--s1" in page and "Criterion parameters" in page

        data = json.loads(urllib.request.urlopen(f"{base}/data").read())
        assert data["exp"] == "run1"
        assert sum(r["kind"] == "train" for r in data["rows"]) == 4

        # a row appended by a live Trainer appears on the next poll
        with open(mpath, "a") as f:
            f.write(json.dumps({"kind": "train", "step": 4, "epoch": 0,
                                "loss": 0.5, "lr": 1e-4}) + "\n")
        data2 = json.loads(
            urllib.request.urlopen(f"{base}/data?exp=run1").read())
        assert sum(r["kind"] == "train" for r in data2["rows"]) == 5

        # unknown experiment falls back, unknown path 404s
        data3 = json.loads(
            urllib.request.urlopen(f"{base}/data?exp=nope").read())
        assert data3["exp"] == "run1"
        try:
            urllib.request.urlopen(f"{base}/bogus")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        srv.server_close()

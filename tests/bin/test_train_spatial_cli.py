"""train --spatial CLI smoke: a short run with the image H axis sharded
over a 2-D (data, spatial) mesh on the virtual 8-device CPU mesh
(parallel/spatial.py). Asserts the run completes, logs finite losses, and
writes a loadable snapshot — the CLI-level counterpart of the numeric
equivalence tests in tests/parallel/test_spatial.py."""

import json

import jax
import numpy as np
import pytest


@pytest.fixture()
def tiny_dataset(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(3)
    rows = []
    for i in range(4):
        h, w = 96, 128
        img = np.full((h, w, 3), 240, np.uint8)
        x1, y1 = int(rng.randint(5, 40)), int(rng.randint(5, 30))
        x2, y2 = x1 + 40, y1 + 30
        img[y1:y2, x1:x2] = (70, 80, 90)
        name = f"p{i}.png"
        Image.fromarray(img).save(tmp_path / name)
        rows.append(f"{name},{x1},{y1},{x2},{y2},table")
    (tmp_path / "annotations.csv").write_text("\n".join(rows) + "\n")
    (tmp_path / "classes.csv").write_text("table,0\n")
    return tmp_path


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_train_spatial_cli(tiny_dataset, tmp_path):
    from tdnet.bin import train

    metrics_path = tmp_path / "metrics.jsonl"
    rc = train.main(
        [
            "--batch-size", "2",
            "--spatial", "4",
            "--epochs", "1",
            "--steps", "2",
            "--snapshot-path", str(tmp_path / "snaps"),
            "--metrics-path", str(metrics_path),
            "--log-every", "1",
            "--image-min-side", "96",
            "--image-max-side", "128",
            "csv",
            str(tiny_dataset / "annotations.csv"),
            str(tiny_dataset / "classes.csv"),
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    losses = [l["loss"] for l in lines if "loss" in l]
    assert losses and all(np.isfinite(l) for l in losses)


def test_spatial_batch_divisibility_error(tiny_dataset, tmp_path):
    from tdnet.bin import train

    # batch 3 does not divide the data axis (8/4 = 2): hard error, no
    # silent single-device fallback under --spatial
    with pytest.raises(SystemExit):
        train.main(
            [
                "--batch-size", "3",
                "--spatial", "4",
                "--epochs", "1",
                "--steps", "1",
                "--snapshot-path", str(tmp_path / "snaps"),
                "--image-min-side", "96",
                "--image-max-side", "128",
                "csv",
                str(tiny_dataset / "annotations.csv"),
                str(tiny_dataset / "classes.csv"),
            ]
        )


def test_spatial_must_divide_devices(tiny_dataset, tmp_path):
    from tdnet.bin import train

    with pytest.raises(SystemExit):
        train.main(
            [
                "--batch-size", "2",
                "--spatial", "3",  # does not divide 8 devices
                "--epochs", "1",
                "--steps", "1",
                "--snapshot-path", str(tmp_path / "snaps"),
                "--image-min-side", "96",
                "--image-max-side", "128",
                "csv",
                str(tiny_dataset / "annotations.csv"),
                str(tiny_dataset / "classes.csv"),
            ]
        )

"""XML->CSV converter tests (fork-delta dataset preparation)."""

import numpy as np
from PIL import Image

from tdnet.bin import csv_from_xml
from tdnet.data.csv_dataset import CSVDataset


def _fixture(tmp_path, n=4):
    img_dir = tmp_path / "pages"
    img_dir.mkdir()
    for i in range(n):
        Image.fromarray(np.zeros((64, 96, 3), np.uint8)).save(img_dir / f"p{i}.png")
        if i < n - 1:  # last page has no xml -> negative example
            (img_dir / f"p{i}.xml").write_text(
                "<annotation><object><name>Table</name><bndbox>"
                f"<xmin>{10 + i}</xmin><ymin>5</ymin><xmax>{40 + i}</xmax>"
                "<ymax>30</ymax></bndbox></object></annotation>"
            )
    return img_dir


def test_convert_and_load_round_trip(tmp_path):
    img_dir = _fixture(tmp_path)
    out = tmp_path / "csv"
    rc = csv_from_xml.main([str(img_dir), "--out-dir", str(out),
                            "--class-name", "table"])
    assert rc == 0

    ds = CSVDataset(str(out / "annotations.csv"), str(out / "classes.csv"))
    assert ds.size() == 4
    assert ds.classes == {"table": 0}
    ann = ds.load_annotations(0)
    np.testing.assert_array_equal(ann["bboxes"], [[10, 5, 40, 30]])
    # negative page parsed with zero boxes
    negatives = [i for i in range(4) if ds.load_annotations(i)["bboxes"].size == 0]
    assert len(negatives) == 1


def test_val_split(tmp_path):
    img_dir = _fixture(tmp_path, n=5)
    out = tmp_path / "csv"
    csv_from_xml.main([str(img_dir), "--out-dir", str(out),
                       "--val-split", "0.4", "--class-name", "table"])
    train = CSVDataset(str(out / "annotations.csv"), str(out / "classes.csv"))
    val = CSVDataset(str(out / "val_annotations.csv"), str(out / "classes.csv"))
    assert train.size() + val.size() == 5
    assert val.size() == 2

"""CSV contract tests (reference: tests/preprocessing/test_csv_generator.py
— StringIO CSVs, parse errors with line numbers)."""

import csv
import io

import numpy as np
import pytest

from tdnet.data.csv_dataset import CSVDataset, read_annotations, read_classes


def _reader(text):
    return csv.reader(io.StringIO(text), delimiter=",")


def test_read_classes():
    classes = read_classes(_reader("table,0\nfigure,1\n"))
    assert classes == {"table": 0, "figure": 1}


def test_read_classes_bad_format():
    with pytest.raises(ValueError, match="line 1: format"):
        read_classes(_reader("onlyonefield\n"))


def test_read_classes_malformed_id():
    with pytest.raises(ValueError, match="line 2: malformed class ID"):
        read_classes(_reader("table,0\nfigure,x\n"))


def test_read_classes_duplicate():
    with pytest.raises(ValueError, match="line 2: duplicate class name"):
        read_classes(_reader("table,0\ntable,1\n"))


def test_read_annotations():
    ann = read_annotations(
        _reader("a.png,10,20,30,40,table\na.png,50,60,70,80,table\nb.png,,,,,\n"),
        {"table": 0},
    )
    assert len(ann["a.png"]) == 2
    assert ann["b.png"] == []  # negative example
    assert ann["a.png"][0] == {"x1": 10, "y1": 20, "x2": 30, "y2": 40, "class": "table"}


def test_read_annotations_malformed_coord():
    with pytest.raises(ValueError, match="line 1: malformed x2"):
        read_annotations(_reader("a.png,10,20,bad,40,table\n"), {"table": 0})


def test_read_annotations_inverted_box():
    with pytest.raises(ValueError, match=r"line 1: x2 \(5\) must be higher than x1 \(10\)"):
        read_annotations(_reader("a.png,10,20,5,40,table\n"), {"table": 0})
    with pytest.raises(ValueError, match=r"line 1: y2 \(5\) must be higher"):
        read_annotations(_reader("a.png,10,20,30,5,table\n"), {"table": 0})


def test_read_annotations_unknown_class():
    with pytest.raises(ValueError, match="line 1: unknown class name: 'chair'"):
        read_annotations(_reader("a.png,1,2,3,4,chair\n"), {"table": 0})


def test_csv_dataset_end_to_end(tmp_path):
    from PIL import Image

    img = np.zeros((32, 48, 3), dtype=np.uint8)
    img[8:24, 10:40] = 200
    Image.fromarray(img).save(tmp_path / "page0.png")
    Image.fromarray(img).save(tmp_path / "page1.png")

    (tmp_path / "classes.csv").write_text("table,0\n")
    (tmp_path / "annotations.csv").write_text(
        "page0.png,10,8,40,24,table\npage1.png,,,,,\n"
    )

    ds = CSVDataset(str(tmp_path / "annotations.csv"), str(tmp_path / "classes.csv"))
    assert ds.size() == 2
    assert ds.num_classes() == 1
    assert ds.label_to_name(0) == "table"
    assert ds.name_to_label("table") == 0
    assert ds.has_label(0) and not ds.has_label(1)

    image = ds.load_image(0)
    assert image.shape == (32, 48, 3)
    ann = ds.load_annotations(0)
    np.testing.assert_array_equal(ann["bboxes"], [[10, 8, 40, 24]])
    np.testing.assert_array_equal(ann["labels"], [0])

    ann1 = ds.load_annotations(1)
    assert ann1["bboxes"].shape == (0, 4)
    assert ds.image_aspect_ratio(0) == pytest.approx(48 / 32)

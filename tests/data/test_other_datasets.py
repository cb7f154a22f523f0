"""PascalVOC / COCO / KITTI / OpenImages loader tests with synthetic fixtures
(reference: tests/preprocessing/* style)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def _png(path, h=32, w=48):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(path)


def test_pascal_voc(tmp_path):
    from tdnet.data.pascal_voc import PascalVocDataset

    root = tmp_path / "voc"
    _png(str(root / "JPEGImages" / "img0.jpg"))
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("img0\n")
    (root / "Annotations").mkdir()
    (root / "Annotations" / "img0.xml").write_text(
        """<annotation><object><name>dog</name><truncated>0</truncated>
        <difficult>0</difficult><bndbox><xmin>11</xmin><ymin>6</ymin>
        <xmax>30</xmax><ymax>25</ymax></bndbox></object>
        <object><name>cat</name><truncated>1</truncated><difficult>0</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>10</xmax><ymax>10</ymax>
        </bndbox></object></annotation>"""
    )

    ds = PascalVocDataset(str(root), "trainval")
    assert ds.size() == 1
    assert ds.num_classes() == 20
    ann = ds.load_annotations(0)
    assert ann["bboxes"].shape == (2, 4)
    np.testing.assert_allclose(ann["bboxes"][0], [10, 5, 29, 24])  # -1 offset
    assert ds.label_to_name(ann["labels"][0]) == "dog"

    ds_skip = PascalVocDataset(str(root), "trainval", skip_truncated=True)
    assert ds_skip.load_annotations(0)["bboxes"].shape == (1, 4)
    assert ds.load_image(0).shape == (32, 48, 3)


def test_coco(tmp_path):
    from tdnet.data.coco import CocoDataset

    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    _png(str(root / "images" / "val" / "0001.jpg"))
    payload = {
        "images": [{"id": 7, "file_name": "0001.jpg", "width": 48, "height": 32}],
        "annotations": [
            {"image_id": 7, "category_id": 22, "bbox": [5, 6, 10, 12], "iscrowd": 0},
            {"image_id": 7, "category_id": 9, "bbox": [1, 1, 0.5, 8], "iscrowd": 0},
            {"image_id": 7, "category_id": 9, "bbox": [2, 2, 8, 8], "iscrowd": 1},
        ],
        "categories": [
            {"id": 22, "name": "table"},
            {"id": 9, "name": "figure"},
        ],
    }
    (root / "annotations" / "instances_val.json").write_text(json.dumps(payload))

    ds = CocoDataset(str(root), "val")
    assert ds.size() == 1 and ds.num_classes() == 2
    # contiguous labels ordered by category id: figure(9)->0, table(22)->1
    assert ds.name_to_label("figure") == 0 and ds.name_to_label("table") == 1
    assert ds.label_to_coco_label(1) == 22
    ann = ds.load_annotations(0)
    # degenerate (w<1) and crowd boxes dropped
    assert ann["bboxes"].shape == (1, 4)
    np.testing.assert_allclose(ann["bboxes"][0], [5, 6, 15, 18])  # xywh->xyxy
    assert ds.image_aspect_ratio(0) == pytest.approx(48 / 32)


def test_kitti(tmp_path):
    from tdnet.data.kitti import KittiDataset

    root = tmp_path / "kitti"
    _png(str(root / "train" / "images" / "000000.png"))
    (root / "train" / "labels").mkdir(parents=True)
    (root / "train" / "labels" / "000000.txt").write_text(
        "Car 0.0 0 1.5 10.0 5.0 30.0 25.0 1.5 1.6 3.9 1.8 1.5 8.5 0.0\n"
        "Pedestrian 0.0 0 1.5 2.0 2.0 8.0 20.0 1.7 0.6 0.8 -1 1.6 12 0.1\n"
    )

    ds = KittiDataset(str(root), "train")
    assert ds.size() == 1
    ann = ds.load_annotations(0)
    np.testing.assert_allclose(ann["bboxes"][0], [10, 5, 30, 25])
    assert ds.label_to_name(ann["labels"][1]) == "Pedestrian"


def test_open_images(tmp_path):
    from tdnet.data.open_images import OpenImagesDataset

    root = tmp_path / "oi"
    (root / "annotations").mkdir(parents=True)
    _png(str(root / "images" / "train" / "abc123.jpg"), h=100, w=200)
    (root / "annotations" / "class-descriptions-boxable.csv").write_text(
        "/m/01,Table\n/m/02,Figure\n"
    )
    (root / "annotations" / "train-annotations-bbox.csv").write_text(
        "ImageID,Source,LabelName,Confidence,XMin,XMax,YMin,YMax,IsOccluded\n"
        "abc123,x,/m/01,1,0.1,0.5,0.2,0.6,0\n"
    )

    ds = OpenImagesDataset(str(root), "train")
    assert ds.size() == 1 and ds.num_classes() == 2
    ann = ds.load_annotations(0)
    # normalized -> pixel coords against the 200x100 image
    np.testing.assert_allclose(ann["bboxes"][0], [20, 20, 100, 60])
    assert ds.label_to_name(ann["labels"][0]) == "Table"

    filtered = OpenImagesDataset(str(root), "train", labels_filter=["Table"])
    assert filtered.num_classes() == 1

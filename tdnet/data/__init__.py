"""Data pipeline: CSV contract, host decode/augment/resize, bucketed
batching, device prefetch."""

from tdnet.data.csv_dataset import CSVDataset, read_annotations, read_classes
from tdnet.data.generator import BatchLoader, LoaderConfig, default_buckets, pick_bucket
from tdnet.data.image import (
    CAFFE_MEAN_BGR,
    compute_resize_scale,
    preprocess_image,
    read_image_bgr,
    resize_image,
)
from tdnet.data.prefetch import prefetch_to_device
from tdnet.data.transform import TransformParameters, random_transform_generator

__all__ = [
    "CSVDataset",
    "read_annotations",
    "read_classes",
    "BatchLoader",
    "LoaderConfig",
    "default_buckets",
    "pick_bucket",
    "CAFFE_MEAN_BGR",
    "compute_resize_scale",
    "preprocess_image",
    "read_image_bgr",
    "resize_image",
    "prefetch_to_device",
    "TransformParameters",
    "random_transform_generator",
]

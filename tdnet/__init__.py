"""tdnet — TPU-native RetinaNet for table detection.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
jabhinav/RetinaNet-for-Table-Detection (a Keras/TF1 application fork of
fizyr/keras-retinanet, see SURVEY.md). The compute path is pure JAX with
Pallas kernels for the hot device-side ops; the runtime around it (data
loading, native host IoU, CLIs) mirrors the reference's public surface.

Layering (strictly downward, mirroring SURVEY.md §2.1):
    ops/       anchor math, box transforms, IoU, losses, target assignment, NMS
    models/    ResNet backbones, FPN, subnets, assembled RetinaNet
    data/      CSV dataset contract, host decode/augment/resize, prefetch
    parallel/  mesh construction + sharding policy (single place for collectives)
    train/     jitted train/eval steps, loop, checkpointing
    utils/     mAP evaluation, visualization, config
    bin/       train / evaluate / convert-model / debug / predict CLIs
    compat/    Keras h5 weight importer for parity testing
    native/    C++ host-side pairwise IoU (analog of compute_overlap.pyx)
"""

__version__ = "0.1.0"

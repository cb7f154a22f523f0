"""Export a .tdn bundle's weights to a keras-retinanet-layout h5.

    python -m tdnet.bin.export_keras model.tdn weights.h5

The reverse of `--weights model.h5`: lets tdnet-trained weights flow back
into the reference ecosystem (or serve as same-weights parity fixtures).
Layer naming follows compat/keras_import.keras_name_map_for, so the file
loads with keras `load_weights(by_name=True)` into the reference's model
for the matching backbone.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Export tdnet weights to a Keras-layout h5."
    )
    parser.add_argument("model", help=".tdn model bundle")
    parser.add_argument("h5_out", help="output .h5 path")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from tdnet.bin._common import ensure_parent_dir
    from tdnet.compat.keras_import import (
        export_random_keras_weights,
        keras_name_map_for,
    )
    from tdnet.models.io import load_model

    model, variables, meta = load_model(args.model, dtype=jnp.float32)
    name_map = keras_name_map_for(model.backbone_name)
    ensure_parent_dir(args.h5_out)
    export_random_keras_weights(args.h5_out, variables, name_map=name_map)
    print(f"exported {args.model} ({model.backbone_name}) -> {args.h5_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

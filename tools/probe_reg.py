"""Diagnostic: can the train step overfit ONE batch? (round-3 convergence
debugging — regression loss sits at ~2.7 while classification descends).

Runs the real train step on a single fixed batch and prints the loss
decomposition; a healthy step drives BOTH losses toward zero on one batch.

    PROBE_SIZE=320x448 PROBE_LR=1e-3 python tools/probe_reg.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tdnet_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tdnet.data.csv_dataset import CSVDataset
    from tdnet.data.generator import BatchLoader, LoaderConfig
    from tdnet.models.retinanet import RetinaNet
    from tdnet.train.step import (create_optimizer, create_train_state,
                                  make_train_step)

    h, w = (int(v) for v in os.environ.get("PROBE_SIZE", "320x448").split("x"))
    lr = float(os.environ.get("PROBE_LR", "1e-3"))
    steps = int(os.environ.get("PROBE_STEPS", "300"))

    data = "/tmp/conv_sweep/data"
    if not os.path.exists(f"{data}/annotations.csv"):
        from examples.table_detection_demo import make_dataset

        make_dataset(data, 48, np.random.RandomState(0))

    ds = CSVDataset(f"{data}/annotations.csv", f"{data}/classes.csv")
    loader = BatchLoader(ds, LoaderConfig(
        batch_size=4, min_side=h, max_side=w, shuffle=False,
    ))
    batch = next(iter(loader))
    print("canvas", batch["images"].shape, "gt boxes",
          int(batch["gt_mask"].sum()))

    model = RetinaNet(num_classes=ds.num_classes())
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (1,) + batch["images"].shape[1:],
        tx=create_optimizer(learning_rate=lr, clipnorm=100.0),
    )
    step_fn = make_train_step(model, ds.num_classes())

    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    for i in range(steps):
        state, m = step_fn(state, batch)
        if i % 25 == 0 or i == steps - 1:
            m = jax.device_get(m)
            print(f"step {i:4d} loss {float(m['loss']):.4f} "
                  f"cls {float(m['classification_loss']):.4f} "
                  f"reg {float(m['regression_loss']):.4f} "
                  f"npos {float(m['num_positive']):.0f}", flush=True)


if __name__ == "__main__":
    main()

"""Regenerate tests/golden/golden.npz — frozen tensors of the SURVEY.md §3
behavioral contract, so a populated reference mount can be diffed in minutes
(SURVEY §8 'per-stage parity harness').

Run from the repo root:  python tools/make_golden.py

Everything here is derived from tdnet's tested implementations of the §3
math; the fixtures pin today's behavior so silent regressions (or a future
reference diff) are caught by tests/golden/test_golden.py.
"""

import os

import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS at startup;
# force CPU through the config API too (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from tdnet.data.image import preprocess_image, resize_image  # noqa: E402
from tdnet.ops.anchors import anchors_for_shape  # noqa: E402
from tdnet.ops.boxes import bbox_transform, bbox_transform_inv, clip_boxes  # noqa: E402
from tdnet.ops.losses import focal, smooth_l1  # noqa: E402
from tdnet.ops.nms import non_max_suppression  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "golden.npz")


def main():
    rng = np.random.RandomState(1234)
    data = {}

    # --- anchors for two image shapes (SURVEY §3 "Anchors") ---------------
    for shape in [(97, 131), (64, 128)]:
        data[f"anchors_{shape[0]}x{shape[1]}"] = np.asarray(
            anchors_for_shape(shape), np.float64
        )

    # --- box transform round-trip (corner parameterization, mean 0/std .2) -
    anchors = np.array(
        [[10.0, 10.0, 50.0, 60.0], [5.0, 0.0, 25.0, 30.0], [0.0, 0.0, 97.0, 131.0]]
    )
    gts = np.array(
        [[12.0, 8.0, 48.0, 63.0], [4.0, 2.0, 27.0, 28.0], [10.0, 20.0, 90.0, 120.0]]
    )
    deltas = np.asarray(bbox_transform(jnp.asarray(anchors), jnp.asarray(gts)))
    decoded = np.asarray(
        bbox_transform_inv(jnp.asarray(anchors), jnp.asarray(deltas))
    )
    clipped = np.asarray(
        clip_boxes(jnp.asarray(decoded)[None], (97, 131))[0]
    )
    data["bt_anchors"] = anchors
    data["bt_gts"] = gts
    data["bt_deltas"] = deltas
    data["bt_decoded"] = decoded
    data["bt_clipped"] = clipped

    # --- losses on fixed tensors (focal a=.25 g=2, smooth-L1 sigma=3) -----
    n, k = 16, 3
    labels = np.zeros((1, n, k + 1), np.float32)
    states = rng.choice([-1.0, 0.0, 1.0], size=n, p=[0.2, 0.5, 0.3])
    labels[0, :, -1] = states
    pos = states == 1.0
    labels[0, pos, rng.randint(0, k, pos.sum())] = 1.0
    logits = rng.randn(1, n, k).astype(np.float32)
    reg_targets = np.zeros((1, n, 5), np.float32)
    reg_targets[0, :, :4] = rng.randn(n, 4).astype(np.float32)
    reg_targets[0, :, 4] = states
    reg_pred = rng.randn(1, n, 4).astype(np.float32)

    data["loss_labels"] = labels
    data["loss_logits"] = logits
    data["loss_reg_targets"] = reg_targets
    data["loss_reg_pred"] = reg_pred
    data["loss_focal"] = np.float64(
        focal(from_logits=True)(jnp.asarray(labels), jnp.asarray(logits))
    )
    data["loss_smooth_l1"] = np.float64(
        smooth_l1()(jnp.asarray(reg_targets), jnp.asarray(reg_pred))
    )

    # --- NMS keep mask (greedy IoU 0.5, tf tie-break semantics) ------------
    boxes = rng.uniform(0, 90, (64, 2))
    sizes = rng.uniform(5, 40, (64, 2))
    nms_boxes = np.concatenate([boxes, boxes + sizes], axis=1).astype(np.float32)
    nms_scores = rng.uniform(0, 1, 64).astype(np.float32)
    keep = np.asarray(
        non_max_suppression(jnp.asarray(nms_boxes), jnp.asarray(nms_scores), 0.5)
    )
    data["nms_boxes"] = nms_boxes
    data["nms_scores"] = nms_scores
    data["nms_keep"] = keep

    # --- preprocessing + resize (caffe BGR mean, cv2 bilinear 800/1333) ----
    img = rng.uniform(0, 255, (97, 131, 3)).astype(np.float32)
    data["img_raw"] = img
    pre = preprocess_image(img, mode="caffe")
    data["img_preprocessed"] = pre
    resized, scale = resize_image(pre, min_side=800, max_side=1333)
    # the full 800-side tensor is ~10 MB; pin a strided sample + moments
    data["img_resized_shape"] = np.asarray(resized.shape)
    data["img_resized_sample"] = resized[::37, ::41, :].astype(np.float32)
    data["img_resized_mean"] = np.float64(resized.mean())
    data["img_scale"] = np.float64(scale)
    # a small-config resize exercises the same rule end-to-end, fully stored
    small, small_scale = resize_image(pre, min_side=160, max_side=260)
    data["img_resized_small"] = small.astype(np.float32)
    data["img_scale_small"] = np.float64(small_scale)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {os.path.abspath(OUT)} ({os.path.getsize(OUT)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()

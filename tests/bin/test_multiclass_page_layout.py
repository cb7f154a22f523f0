"""BASELINE config 5: multi-class page-layout detection (tables/figures/text)
with class-aware decode + soft-NMS — synthetic end-to-end."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def layout_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("layout")
    rng = np.random.RandomState(1)
    rows = []
    colors = {"table": (80, 90, 100), "figure": (160, 60, 60), "text": (60, 160, 60)}
    for i in range(6):
        h, w = 96, 128
        img = np.full((h, w, 3), 250, np.uint8)
        for cls in ["table", "figure", "text"]:
            x1, y1 = int(rng.randint(2, 60)), int(rng.randint(2, 40))
            x2 = min(x1 + int(rng.randint(20, 50)), w - 2)
            y2 = min(y1 + int(rng.randint(15, 40)), h - 2)
            img[y1:y2, x1:x2] = colors[cls]
            rows.append(f"page{i}.png,{x1},{y1},{x2},{y2},{cls}")
        Image.fromarray(img).save(root / f"page{i}.png")
    (root / "annotations.csv").write_text("\n".join(rows) + "\n")
    (root / "classes.csv").write_text("table,0\nfigure,1\ntext,2\n")
    return root


def test_multiclass_train_and_softnms_eval(layout_dataset):
    import jax
    import jax.numpy as jnp

    from tdnet.data.csv_dataset import CSVDataset
    from tdnet.data.generator import BatchLoader, LoaderConfig
    from tdnet.models.retinanet import RetinaNet
    from tdnet.train.predictor import Predictor
    from tdnet.train.step import create_optimizer, create_train_state, make_train_step
    from tdnet.utils.eval import evaluate

    ds = CSVDataset(
        str(layout_dataset / "annotations.csv"), str(layout_dataset / "classes.csv")
    )
    assert ds.num_classes() == 3

    cfg = LoaderConfig(batch_size=2, min_side=96, max_side=128,
                       buckets=[(128, 128)], shuffle=False)
    loader = BatchLoader(ds, cfg)
    model = RetinaNet(num_classes=3, dtype=jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), (2, 128, 128, 3),
        tx=create_optimizer(3e-4, 1e6),
    )
    step = make_train_step(model, num_classes=3)

    batches = loader.forever()
    for _ in range(12):
        state, metrics = step(state, next(batches))
    assert int(metrics["num_positive"]) > 0

    # class-aware decode + soft-NMS predictor (config 5)
    predictor = Predictor(
        model,
        {"params": state.params, "batch_stats": state.batch_stats},
        min_side=96, max_side=128, buckets=[(128, 128)],
        soft_nms_sigma=0.5, score_threshold=0.01, pre_nms_top_k=256,
        max_detections=20,
    )
    aps = evaluate(ds, predictor, score_threshold=0.01)
    assert set(aps.keys()) == {0, 1, 2}
    assert all(n == 6 for _, n in aps.values())  # 6 GT per class
    for ap, _ in aps.values():
        assert 0.0 <= ap <= 1.0
    # 12 steps is enough signal that at least one class must be above
    # zero AP (round-3 weak #9: the old [0,1]-range check passed with an
    # untrained net); the full learning proofs are the gated slow tests
    assert max(ap for ap, _ in aps.values()) > 0.0

    boxes, scores, labels = predictor(ds.load_image(0))
    kept = scores > 0.01
    assert kept.sum() > 0
    assert set(np.unique(labels[kept])) <= {0, 1, 2}

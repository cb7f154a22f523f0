"""RetinaNet assembly: FPN + shared subnets (flax).

Behavioral contract (SURVEY.md §3 "Model"; reference: models/retinanet.py
~L1-350):

- FPN: P5 = 1x1(C5, 256); P4 = 1x1(C4) + NearestUpsampleLike(P5);
  P3 likewise; each of P3/P4/P5 then 3x3(256); P6 = 3x3 stride-2 on C5;
  P7 = 3x3 stride-2 on ReLU(P6). All convs padding 'SAME' with bias.
- Subnets: 4 x [3x3(256) + ReLU], kernel init Normal(0.01), zero bias,
  WEIGHTS SHARED ACROSS PYRAMID LEVELS; classification head bias
  PriorProbability(0.01), output 9*K channels; regression head 9*4.
- Per-level outputs reshaped (B, H*W*A, *) and concatenated P3->P7 — the
  exact anchor order of ops/anchors.anchors_for_shape.

The classification output is returned as LOGITS (the sigmoid lives in the
loss / inference path); the reference emits sigmoid probabilities — scores
are identical after the inference-path sigmoid.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from tdnet.models.layers import PriorProbability, resize_nearest_like
from tdnet.models.resnet import STAGE_SIZES, ResNet

__all__ = ["RetinaNet", "FPN", "ClassificationSubnet", "RegressionSubnet",
           "apply_retinanet_tail"]


def _build_backbone(name: str, dtype, freeze_bn: bool,
                    stem_input: bool = False,
                    block_kernel: bool = False) -> nn.Module:
    """Instantiate a C3/C4/C5 feature extractor by registry name
    (reference: models/__init__.py backbone() dispatch)."""
    if name in STAGE_SIZES:
        return ResNet(stage_sizes=STAGE_SIZES[name], dtype=dtype,
                      freeze_bn=freeze_bn, stem_input=stem_input,
                      block_kernel=block_kernel, name="backbone")
    if name.startswith("seresnet") and name[2:] in STAGE_SIZES:
        return ResNet(stage_sizes=STAGE_SIZES[name[2:]], se_ratio=1.0 / 16,
                      dtype=dtype, freeze_bn=freeze_bn,
                      stem_input=stem_input, name="backbone")
    if stem_input:
        raise ValueError(f"stem_input is ResNet-only, got backbone {name!r}")
    if name in ("vgg16", "vgg19"):
        from tdnet.models.vgg import VGG, VGG_STAGES

        return VGG(stage_sizes=VGG_STAGES[name], dtype=dtype, name="backbone")
    if name in ("densenet121", "densenet169", "densenet201"):
        from tdnet.models.densenet import DENSENET_BLOCKS, DenseNet

        return DenseNet(block_sizes=DENSENET_BLOCKS[name], dtype=dtype,
                        freeze_bn=freeze_bn, name="backbone")
    if name.startswith("mobilenet"):
        from tdnet.models.mobilenet import MobileNet

        # 'mobilenet224_1.0' style names (reference) or plain 'mobilenet'
        alpha = float(name.split("_")[-1]) if "_" in name else 1.0
        return MobileNet(alpha=alpha, dtype=dtype, freeze_bn=freeze_bn,
                         name="backbone")
    raise ValueError(
        f"unknown backbone {name!r}; available: resnet50/101/152, "
        "seresnet50/101/152, vgg16/19, densenet121/169/201, "
        "mobilenet[_<alpha>]"
    )


class FPN(nn.Module):
    """Pyramid features P3..P7 from backbone taps C3/C4/C5."""

    feature_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5) -> Tuple[jnp.ndarray, ...]:
        conv = lambda k, s, name: nn.Conv(
            self.feature_size, (k, k), strides=(s, s), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )

        p5 = conv(1, 1, "C5_reduced")(c5)
        p5_up = resize_nearest_like(p5, c4.shape[1:3])
        p5 = conv(3, 1, "P5")(p5)

        p4 = conv(1, 1, "C4_reduced")(c4) + p5_up
        p4_up = resize_nearest_like(p4, c3.shape[1:3])
        p4 = conv(3, 1, "P4")(p4)

        p3 = conv(1, 1, "C3_reduced")(c3) + p4_up
        p3 = conv(3, 1, "P3")(p3)

        p6 = conv(3, 2, "P6")(c5)
        p7 = conv(3, 2, "P7")(nn.relu(p6))

        return p3, p4, p5, p6, p7


class _Subnet(nn.Module):
    """4 x [3x3 conv + ReLU] tower + task head; one instance is applied to
    every pyramid level, so the weights are shared (reference:
    default_classification_model / default_regression_model)."""

    out_channels: int
    head_bias_init: Any
    feature_size: int = 256
    depth: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kinit = nn.initializers.normal(stddev=0.01)
        for i in range(self.depth):
            x = nn.Conv(
                self.feature_size, (3, 3), padding="SAME",
                kernel_init=kinit, bias_init=nn.initializers.zeros_init(),
                dtype=self.dtype, param_dtype=jnp.float32, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding="SAME",
            kernel_init=kinit, bias_init=self.head_bias_init,
            dtype=self.dtype, param_dtype=jnp.float32, name="head",
        )(x)
        return x


class ClassificationSubnet(_Subnet):
    pass


class RegressionSubnet(_Subnet):
    pass


def apply_retinanet_tail(
    c3, c4, c5, *,
    num_classes: int,
    num_anchors: int = 9,
    feature_size: int = 256,
    prior_probability: float = 0.01,
    dtype: Any = jnp.float32,
    output_dtype: Any = jnp.float32,
    activation_sharding: Any = None,
) -> Dict[str, jnp.ndarray]:
    """Post-backbone graph shared by RetinaNet.__call__ and the pipeline's
    head stage (parallel/pipeline.py _HeadStage): FPN + shared subnets +
    per-level reshape/concat + output cast. Must be called inside an
    nn.compact __call__ — the child modules (fpn / *_submodel) register
    under the caller with fixed names, so both callers produce identical
    param trees (pinned bit-identical by tests/parallel/test_pipeline.py).
    """
    if activation_sharding is not None:
        # pin taps + features so the conv trunk stays spatially sharded
        # end-to-end (GSPMD would otherwise be free to all-gather after
        # any op); the head flatten below is the designed gather point.
        # Only under a trace: inside jit GSPMD pads uneven H shards
        # (P7 can be 1 row over 4 devices), but an EAGER
        # with_sharding_constraint (e.g. model.init in
        # create_train_state) is a strict reshard that rejects uneven
        # dims — and eager init has no partitioner to guide anyway.
        import jax

        cons = lambda t: (
            jax.lax.with_sharding_constraint(t, activation_sharding)
            if isinstance(t, jax.core.Tracer) else t)
        c3, c4, c5 = cons(c3), cons(c4), cons(c5)

    features = FPN(feature_size, dtype=dtype, name="fpn")(c3, c4, c5)
    if activation_sharding is not None:
        features = tuple(cons(f) for f in features)

    reg_subnet = RegressionSubnet(
        out_channels=num_anchors * 4,
        head_bias_init=nn.initializers.zeros_init(),
        feature_size=feature_size,
        dtype=dtype,
        name="regression_submodel",
    )
    cls_subnet = ClassificationSubnet(
        out_channels=num_anchors * num_classes,
        head_bias_init=PriorProbability(prior_probability),
        feature_size=feature_size,
        dtype=dtype,
        name="classification_submodel",
    )

    b = c3.shape[0]
    regression = jnp.concatenate(
        [reg_subnet(f).reshape(b, -1, 4) for f in features], axis=1
    )
    classification = jnp.concatenate(
        [cls_subnet(f).reshape(b, -1, num_classes) for f in features], axis=1
    )
    # heads run in compute dtype (bf16); emit output_dtype (f32 for
    # losses/legacy decode, None = native for the deferred tail)
    if output_dtype is not None:
        regression = regression.astype(output_dtype)
        classification = classification.astype(output_dtype)
    return {"regression": regression, "classification": classification}


class RetinaNet(nn.Module):
    """Training-graph RetinaNet: images -> {regression, classification}.

    Matches the reference training model's outputs
    [regression (B,N,4), classification (B,N,K)] (reference: retinanet());
    the inference path (decode/clip/NMS — reference: retinanet_bbox()) is
    tdnet.models.detect.detections_from_outputs, kept outside the module
    because anchors are trace-time constants of the (static) input shape.
    """

    num_classes: int
    backbone_name: str = "resnet50"
    num_anchors: int = 9
    feature_size: int = 256
    prior_probability: float = 0.01
    dtype: Any = jnp.float32
    freeze_bn: bool = True
    stem_input: bool = False  # images are precomputed stem activations
    # (B, H/4, W/4, 64) from the fused ingest+stem kernel; same variables
    # as the stem_input=False model (conv1/bn1 are simply unused)
    output_dtype: Any = jnp.float32  # losses/legacy decode want f32; None
    # keeps the heads' compute dtype (bf16) at the boundary — the deferred
    # inference tail upcasts only the K candidates (the f32 cast of a bf16
    # value is exact, so results are bit-identical; saves the ~0.5 GB/step
    # boundary cast at batch 128 plus half the top-k/gather traffic)
    block_kernel: bool = False  # ResNet identity bottlenecks via the
    # fused VMEM-resident Pallas kernel (ops/pallas_block.py) — same
    # variables as block_kernel=False; inference-only (no VJP). Enabled
    # by the Predictor on TPU ResNets (train/predictor.py).
    activation_sharding: Any = None  # optional NamedSharding pinning NHWC
    # activations (backbone taps + pyramid features) to a mesh, e.g.
    # P('data', 'spatial') for GSPMD spatial partitioning
    # (parallel/spatial.py). None (default) leaves placement to the
    # partitioner's propagation — a no-op single-device.

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        c3, c4, c5 = _build_backbone(
            self.backbone_name, self.dtype, self.freeze_bn, self.stem_input,
            self.block_kernel,
        )(images)
        return apply_retinanet_tail(
            c3, c4, c5,
            num_classes=self.num_classes,
            num_anchors=self.num_anchors,
            feature_size=self.feature_size,
            prior_probability=self.prior_probability,
            dtype=self.dtype,
            output_dtype=self.output_dtype,
            activation_sharding=self.activation_sharding,
        )

"""CLI entry points: train, evaluate, convert-model, debug, predict
(reference: keras_retinanet/bin/ console scripts)."""

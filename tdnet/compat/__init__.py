"""Compatibility: Keras h5 weight import for parity testing."""

"""Utilities: evaluation, visualization, config."""

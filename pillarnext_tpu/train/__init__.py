"""Trainer runtime: state, steps, checkpoints, trainer loop."""

"""Arg-compatible CLI entry points (train / finetune / test / select / viz)."""

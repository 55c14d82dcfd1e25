"""Pool optimizer: choose per-dataset parameters under a probe budget."""

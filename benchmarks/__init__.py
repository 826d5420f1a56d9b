"""TPU benchmark suite (see refresh_all.sh for the one-shot refresh)."""

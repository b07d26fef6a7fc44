"""Cross-cutting utilities: snapshots, profiling, serde."""

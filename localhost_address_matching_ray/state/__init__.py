"""Cross-run state: manifest-validated Parquet checkpoints and per-stage
metrics sidecars (north_rule: "resumable from checkpoint with per-partition
lineage + metrics")."""

"""Sources/sinks: pruned Parquet readers and table derivations."""

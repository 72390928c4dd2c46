"""Ray Data pipeline stages. Each stage is `Dataset → Dataset`, streaming,
zero-copy Arrow batches wherever the kernel allows."""

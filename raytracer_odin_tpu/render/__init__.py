# Render runtime: accumulation, device render steps, output modes,
# checkpointing, preview.

# Multi-chip scaling: device mesh construction + sharded render steps.

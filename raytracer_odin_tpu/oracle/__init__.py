# Independent CPU reference renderer (numpy) — the RMSE oracle.

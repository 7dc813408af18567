"""Sources: schema'd testdata readers + the deterministic fixture web."""

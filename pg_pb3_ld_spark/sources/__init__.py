"""Frame sources: where LSN-ordered wire batches come from."""

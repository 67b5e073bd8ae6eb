"""Sources: fixture generation + table loaders."""

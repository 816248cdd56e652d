"""Sources & sinks: hash memo (incremental ledger), audit table, loaders."""

"""Host-side utilities: config/flags, checkpointing, logging, IO."""

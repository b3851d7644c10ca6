"""Sources: file readers, REST ingestion, sinks."""

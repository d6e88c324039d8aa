"""Sources: Kafka (Structured Streaming) and file-based stand-ins."""

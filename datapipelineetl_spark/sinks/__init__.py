"""Sink adapters: Kafka-style JSON envelope serde, routed file sinks."""

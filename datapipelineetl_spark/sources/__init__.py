"""Source adapters: schema-declared file readers, TS 32.435 XML flattener."""

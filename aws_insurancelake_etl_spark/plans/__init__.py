"""Pipeline stages: lineage, data quality, schema gate, writer, stage runners."""

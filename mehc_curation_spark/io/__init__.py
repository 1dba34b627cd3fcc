"""IO layer: snapshot-table emulation over Parquet, per-partition
lineage/metrics ledger, and text-report rendering."""

"""Plans: end-to-end pipeline composition, dimension refresh runners,
checkpoint/lineage."""

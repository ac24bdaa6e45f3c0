"""Pipeline stages: sha256 exact dedup -> MinHash/LSH -> SimHash -> verify -> cluster."""

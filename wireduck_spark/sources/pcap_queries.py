"""Queries over the `pcap` data source (filled in alongside sources/pcap.py;
registered separately so the relational corpus imports without a pcap
fixture present)."""

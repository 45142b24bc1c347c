"""End-to-end pipelines mirroring the reference's run scripts."""

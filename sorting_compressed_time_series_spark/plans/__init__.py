"""End-to-end jobs: full pipeline, checkpoint-resumable tier promotion."""

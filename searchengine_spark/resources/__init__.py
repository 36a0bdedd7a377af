"""Static resources (stopword list)."""

"""Sources: fixture synthesis and scaled spans-table generation."""

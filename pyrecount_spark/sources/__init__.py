"""Sources & sinks (SURVEY.md §2.1): file readers and the catalog layer."""

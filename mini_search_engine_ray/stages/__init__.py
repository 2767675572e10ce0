"""Dataset -> Dataset transform stages."""

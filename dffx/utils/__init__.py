"""dffx.utils — host-side utilities (logging, profiling, event files)."""

"""Command-line programs (flag-compatible with the reference bin/)."""

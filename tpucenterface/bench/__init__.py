"""Benchmark harness (SURVEY.md §6; the 5 BASELINE configs live in
cli.bench_suite; `timing` provides tunnel-safe device timing)."""

"""Command-line entry points: train, generate, analyze, bench_mas."""

"""L5 command-line drivers: nrmcl (main), analysis, perf, corpus runner."""

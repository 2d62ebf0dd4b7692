"""Stage-job plans (SURVEY.md §3.1's three ETL stages + §3.2 query APIs)."""

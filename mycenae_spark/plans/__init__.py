"""Query IR + planner: OpenTSDB query dicts and the functional expression
language both lower to one ``TsdbQuery`` IR, planned into a DataFrame program
whose real optimizer is Catalyst (SURVEY.md §3–§4)."""

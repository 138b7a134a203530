# Structured Streaming variants of the batch event operators.

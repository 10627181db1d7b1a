"""Golden error strings, kept byte-identical to the reference so the
error-path tests port 1:1 (reference collection_test.go:335-392)."""

ERR_QUERY_TEXT_EMPTY = "queryText is empty"
ERR_QUERY_EMBEDDING_EMPTY = "queryEmbedding is empty"
ERR_NRESULTS_POSITIVE = "nResults must be > 0"
ERR_NRESULTS_TOO_LARGE = "nResults must be <= the number of documents in the collection"
ERR_UNSUPPORTED_OPERATOR = "unsupported operator"
ERR_VECTOR_LENGTH = "vectors must have the same length"

"""Shared ANN-family corpus constants — a LEAF module (imports
nothing from the package) so both ``llm.similarity`` and ``llm.pq``
can read them at module-init time regardless of which of the two is
imported first.

Why this exists (r14): similarity's ``ann_index_append`` dispatch
oracle needs pq's helpers at REGISTRATION time (a decorator argument
evaluates during module exec), and pq's oracle builders need
similarity's CTE helpers the same way — a genuine two-way
registration-time dependency. Executors import whichever module the
pickled Arrow kernel lives in FIRST, so a top-level constant import
in either direction made worker start-up order-dependent (the sf0.1
bench caught pq-first workers dying on a partially initialized
module). Constants live here; the function-level needs stay lazy
imports inside the oracle builders, which run only after both
modules' own names are defined.
"""

TOP_K = 10
N_QUERIES = 5  # query set = vec_id < 5
EMBED_DIM = 64  # embeddings table vector width (FIXTURES.md §2)

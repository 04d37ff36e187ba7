"""trustfuse_spark — a from-scratch, PySpark-native KG-construction & fusion engine.

Re-expresses the capabilities of the TrustFuse testbed
(Orange-OpenSource/trustfuse, reference snapshot at /root/reference) as an
idiomatic Spark DataFrame pipeline:

    docs (interleaved text+media spans)
      -> extract   (vectorized Arrow UDF: spans -> claims)
      -> link      (minhash blocking + scorer)
      -> canonical (connected components, salted)
      -> bucketize (temporal session buckets)
      -> fuse      (truth-discovery: majority/CRH/TruthFinder/CATD/GTM/ACCU/
                    KDEm/SLiMFast/LTM as iterated grouped aggregations with
                    broadcast source-trust vectors)
      -> triples   (subj, pred, obj) + weights
      -> evaluate  (P/R/Acc/F1/completion/specificity/MNAD)

Everything is declarative DataFrame/SQL; Python only inside Arrow-batched
pandas UDFs where group-local pairwise math demands it.
"""

__version__ = "0.1.0"

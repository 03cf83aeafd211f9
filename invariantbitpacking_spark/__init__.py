"""invariantbitpacking_spark — a from-scratch PySpark-native per-column
lightweight-compression engine reproducing the Invariant Bit Packing
scheme of AKKamath/InvariantBitPacking (EuroSys'26), plus dictionary,
RLE, FOR/delta-FOR, and FSST codecs with statistics-driven codec
auto-selection, over tables of pre-tokenized training sequences.

Quick start::

    from invariantbitpacking_spark import (
        get_spark, learn_params, encode_auto, decode_auto)

    spark = get_spark()
    toks = spark.read.parquet(".../tokens")   # doc_id, tokens, n_tok, source
    params = learn_params(toks, sample_fraction=0.1)
    encoded = encode_auto(toks, params)       # per-doc codec argmin
    restored = decode_auto(encoded, params)   # bit-identical tokens

See COVERAGE.md for the operator-by-operator map to the reference.
"""

__version__ = "0.1.0"

try:  # pyspark-backed surface (codecs/ stays importable without a JVM)
    from .session import get_spark  # noqa: F401
    from .operators.ibp import (  # noqa: F401
        IbpParams, learn_params, encode_ibp, decode_ibp)
    from .operators.selector import encode_auto, decode_auto  # noqa: F401
    from .operators.kmeans import (  # noqa: F401
        KmeansParams, learn_kmeans, encode_ibp_kmeans, decode_ibp_kmeans)
    from .plans.pipeline import CompressionPipeline  # noqa: F401
except ImportError:  # pragma: no cover
    pass

"""invariantbitpacking_spark — a from-scratch PySpark-native per-column
lightweight-compression engine reproducing the Invariant Bit Packing
scheme of AKKamath/InvariantBitPacking (EuroSys'26), plus dictionary,
RLE, FSST, and frame-of-reference codecs with statistics-driven codec
auto-selection, over tables of pre-tokenized training sequences."""

__version__ = "0.1.0"

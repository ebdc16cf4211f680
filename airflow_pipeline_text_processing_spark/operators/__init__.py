"""Large-scale LLM-data-pipeline operators (north-star extensions).

All hot paths are built-in Catalyst expressions (JVM-side, codegen'd);
Python appears only in the multimodal mapInPandas plumbing where binary
decoding genuinely needs a library.
"""

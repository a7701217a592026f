"""fulgor-tpu: a TPU-native colored compacted de Bruijn graph index.

A ground-up re-design of the capabilities of Fulgor (jermp/fulgor, v4.2.0):
map any k-mer to the set of reference genomes ("colors") containing it and
answer pseudoalignment / k-mer conservation / k-mer matches queries over
pangenomes — with the query compute path running on TPU via JAX/XLA/Pallas
and the build path running in native C++ on the host.

Layer map (TPU-first, not a port — see SURVEY.md for the reference layout):

  host  C++    ccdBG construction (GGCAT equivalent), cuckoo-table build,
               codec encode/decode hot loops           -> fulgor_tpu/native
  host  numpy  bitstream codecs, Elias-Fano, container -> fulgor_tpu/core
  device JAX   batched k-mer lookup + color algebra    -> fulgor_tpu/ops
  mesh  pjit   reads-DP x color-sharding               -> fulgor_tpu/parallel
  CLI          build/pseudoalign/... subcommand parity -> fulgor_tpu/cli
"""

__version__ = "0.1.0"

INDEX_VERSION = (1, 0, 0)

"""Pure, Ray-free kernels: analysis chain, codecs, scoring, sketches."""

"""Supervised training (etraining equivalent): GenBank-annotated sequences
in, species .pbl parameter files out (reference src/etraining.cc,
src/exontrain.cc, src/introntrain.cc, src/igenictrain.cc)."""

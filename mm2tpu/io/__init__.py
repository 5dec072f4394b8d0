from .bseq import FastxReader, Seq, read_fastx, revcomp

from ganon_tpu.io.sequence import SequenceReader, read_batches

__all__ = ["SequenceReader", "read_batches"]

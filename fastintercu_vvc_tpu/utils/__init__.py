"""YUV I/O, config system, bitstream byte-level writer, tracing."""

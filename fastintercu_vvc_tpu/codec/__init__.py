"""Bitstream layer: CABAC engine, context models, HLS writers, residual
coding, partition logic, frame/GOP encoders."""

"""Quantized ONNX op emitters: QLinearConv / QLinearMatMul / (De)QuantizeLinear.

Placeholder module populated in the quantization milestone; importing it is
safe (registers nothing yet).
"""

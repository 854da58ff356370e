"""Interop bridges to other autodiff frameworks."""

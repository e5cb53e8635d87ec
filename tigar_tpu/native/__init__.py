"""Native (C++) preprocessing kernels, built lazily with g++ and loaded via
ctypes.  See basis_kernel.cpp; ops/native.py provides the Python bindings
with numpy fallbacks."""

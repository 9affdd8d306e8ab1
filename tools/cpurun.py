"""Run a python script on the CPU backend despite the axon sitecustomize.

Usage: python tools/cpurun.py script.py [args...]
       python tools/cpurun.py -c "python code"
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

if __name__ == "__main__":
    if sys.argv[1] == "-c":
        exec(sys.argv[2], {"__name__": "__main__"})
    else:
        path = sys.argv[1]
        sys.argv = sys.argv[1:]
        exec(compile(open(path).read(), path, "exec"), {"__name__": "__main__"})

"""Build the native DSP library: python -m pika_tpu.native.build"""

import os
import subprocess


def main():
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    native = os.path.join(root, "native")
    subprocess.run(["make", "-C", native], check=True)
    print(os.path.join(native, "libpika_dsp.so"))


if __name__ == "__main__":
    main()

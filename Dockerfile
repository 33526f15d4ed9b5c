# Reproducible end-to-end demo image (the reference's scripts/Dockerfile
# equivalent): build the native triangulator, run the test suite, and ship
# the synthetic demo as the default command. No dataset download needed —
# the synthetic renderer provides posed frames with ground truth.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir "jax[cpu]" numpy scipy pyyaml \
        opencv-python-headless pytest matplotlib pillow

WORKDIR /opt/tpu-flame
COPY . .
RUN mkdir -p flame_ros_tpu/native/build && \
    g++ -O2 -shared -fPIC -std=c++17 flame_ros_tpu/native/delaunay.cpp \
        -o flame_ros_tpu/native/build/libflame_delaunay.so

ENV PYTHONPATH=/opt/tpu-flame
CMD ["bash", "scripts/demo.sh", "/out", "60"]

module github.com/zkm-tpu/go-runtime/zkm_runtime

go 1.22

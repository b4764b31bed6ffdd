"""IndexName goldens: the reference's goldenfile corpus
(/root/reference/crates/tokenizer/tests/files-list.txt -> index-list.txt via
index_tests.rs:1-19) plus the inline tests (index_name.rs:191-289)."""

import pytest

from logjuicer_spark.indexname import (
    _is_hexadecimal,
    _remove_non_vowel_component,
    index_name_from_path,
)

GOLDENFILE = [
    ("job-output.txt.gz", "job-output"),
    ("k8s-cluster-resources/CRDs/customresourcedefinition.apiextensions.k8s.io/routes.route.openshift.io.txt",
     "customresourcedefinition.apiextensions.io/routes.route.openshift.io"),
    ("k8s-cluster-resources/CRDs/customresourcedefinition.apiextensions.k8s.io/softwarefactories.sf.softwarefactory-project.io.txt",
     "customresourcedefinition.apiextensions.io/softwarefactories.softwarefactory-project.io"),
    ("k8s-cluster-resources/persistentvolume/pvc-b9219444-3599-4e82-be5c-b0584a4f9944.txt",
     "persistentvolume/UID"),
    ("k8s-cluster-resources/persistentvolume/pvc-c230c7bf-360a-46e6-b27a-b983d7610340.txt",
     "persistentvolume/UID"),
    ("k8s-cluster-resources/nodes.txt", "cluster-resources/nodes"),
    ("k8s-resources/bundle-catalog-ns/configmap/6339eec3ca2d6a0e36787b10daa5c6513b6ec79933804bd9dcb4c3b59b6e7ee.txt",
     "configmap/UID"),
    ("k8s-resources/bundle-catalog-ns/deployment.apps/cert-manager-cainjector.txt",
     "deployment.apps/cert-manager-cainjector"),
    ("k8s-resources/bundle-catalog-ns/deployment.apps/sf-operator-controller-manager.txt",
     "deployment.apps/operator-controller-manager"),
    ("k8s-resources/bundle-catalog-ns/job.batch/6339eec3ca2d6a0e36787b10daa5c6513b6ec79933804bd9dcb4c3b59b6e7ee.txt",
     "job.batch/UID"),
    ("k8s-resources/bundle-catalog-ns/pod/6339eec3ca2d6a0e36787b10daa5c6513b6ec79933804bd9dcb4c3b59b8t6m9-extract-logs.txt",
     "pod/UID-extract-logs"),
    ("k8s-resources/bundle-catalog-ns/pod/6339eec3ca2d6a0e36787b10daa5c6513b6ec79933804bd9dcb4c3b59b8t6m9.txt",
     "pod/UID"),
    ("k8s-resources/bundle-catalog-ns/pod/cert-manager-webhook-6845dffd6f-4gpzw.txt",
     "pod/cert-manager-webhook"),
    ("k8s-resources/bundle-catalog-ns/pod/localhost-5000-sf-operator-bundle-latest-registry-grpc-logs.txt",
     "pod/localhost-operator-bundle-latest-registry-logs"),
    ("k8s-resources/bundle-catalog-ns/pod/sf-operator-controller-manager-5bf6fdf84d-f9lnb-kube-rbac-proxy-logs.txt",
     "pod/operator-controller-manager-kube-rbac-proxy-logs"),
    ("k8s-resources/bundle-catalog-ns/pod/sf-operator-controller-manager-5bf6fdf84d-f9lnb.txt",
     "pod/operator-controller-manager"),
    ("k8s-resources/bundle-catalog-ns/subscription.operators.coreos.com/sf-operator-v0-0-0-sub.txt",
     "subscription.operators.coreos.com/operator-sub"),
    ("k8s-resources/sf/persistentvolumeclaim/git-server-git-server-0.txt",
     "persistentvolumeclaim/git-server-git-server"),
    ("k8s-resources/sf/persistentvolumeclaim/logserver.txt",
     "persistentvolumeclaim/logserver"),
    ("k8s-resources/sf/persistentvolumeclaim/mariadb-logs-mariadb-0.txt",
     "persistentvolumeclaim/mariadb-logs-mariadb"),
    ("k8s-resources/sf/pod/config-base-secret-jbdtd-sf-operator-logs.txt",
     "pod/config-base-secret-operator-logs"),
    ("k8s-resources/sf/pod/config-base-secret-jbdtd.txt", "pod/config-base-secret"),
    ("k8s-resources/sf/pod/gerrit-post-init-6xn2j-gerrit-post-init-container-logs.txt",
     "pod/gerrit-post-init-gerrit-post-init-container-logs"),
    ("k8s-resources/sf/pod/gerrit-post-init-6xn2j.txt", "pod/gerrit-post-init"),
    ("k8s-resources/sf/pod/logserver-b4cd4d4fb-v9d25-logserver-logs.txt",
     "pod/logserver-logserver-logs"),
    ("k8s-resources/sf/pod/logserver-b4cd4d4fb-v9d25.txt", "pod/logserver"),
    ("k8s-resources/sf/pod/managesf-resources-66f847649f-c98zn-managesf-resources-logs.txt",
     "pod/managesf-resources-managesf-resources-logs"),
    ("k8s-resources/sf/pod/managesf-resources-66f847649f-c98zn.txt",
     "pod/managesf-resources"),
    ("k8s-resources/sf/pod/nodepool-launcher-fcd58c584-tlpng-launcher-logs.txt",
     "pod/nodepool-launcher-launcher-logs"),
    ("k8s-resources/sf/pod/setup-config-repo-8d6st-sf-operator-logs.txt",
     "pod/setup-config-repo-operator-logs"),
    ("k8s-resources/sf/pod/setup-config-repo-8d6st.txt", "pod/setup-config-repo"),
    ("zuul-info/zuul-info.controller.txt", "zuul-info/zuul-info.controller"),
]

INLINE = [
    # index_name.rs:196-289 (log_model_name + test_index0*)
    ("containers/libvirt/qemu/instance-0000001d.log.txt.gz", "qemu/instance"),
    ("libvirt/qemu/instance-000000ec.log.txt.gz", "qemu/instance"),
    ("builds/2/log", "builds/log"),
    ("builds/42/log", "builds/log"),
    ("journal/191f9d948de542028f9b5b1731d2f400/system@00063b2d7c4cfbed-574870f97843e8e0.journal",
     "journal/system"),
    ("journal/system.journal", "journal/system"),
    ("_all_nodes/sosreport-networker-pyoo1wkk-2.tar.xz", "allnodes/sosreport-networker"),
    ("_all_nodes/sosreport-networker-pyoo1wka-1.tar.xz", "allnodes/sosreport-networker"),
    ("audit/audit.log", "audit/audit.log"),
    ("audit/audit.log.1", "audit/audit.log"),
    ("zuul/merger.log", "zuul/merger.log"),
    ("zuul/merger.log.2017-11-12", "zuul/merger.log"),
    ("pod/6339eec3ca2d6a0e36787b10daa5c6513b6ec79933804bd9dcb4c3b59bvwstc.txt", "pod/UID"),
    ("pod/6339eec3cA2d6a0e36787b10daa5c6513b6ec79933804bd9dcb4c3b59bvwstc.txt", "pod/UID"),
    ("ironic/app.log.txt.gz", "ironic/app.log"),
    ("ironic/app.log.1.gz", "ironic/app.log"),
    ("swift-proxy-5b4bcb6699-hk9lb.log", "swift-proxy-log"),
    ("rabbitmq-server-0/logs/rabbitmq-server-0.log", "rabbitmq-server/rabbitmq-server-log"),
    ("pods/openstack_openstack-galera-0_a720a2da-7235-461d-95c2-19518e90cd33/galera/0.log",
     "galera/log"),
    ("openstack_rabbitmq-server-0_b4fbdf24-cd9a-4572-8321-6dbd90356745/rabbitmq/0.log",
     "rabbitmq/log"),
    ("dummy-42-image-722e550664244ca5959a61f6dd950b9a.log", "dummy-image-log"),
    ("config-update/015da2b/job-output.json.gz", "config-update/job-output.json"),
]


@pytest.mark.parametrize("path,expected", GOLDENFILE, ids=range(len(GOLDENFILE)))
def test_goldenfile(path, expected):
    assert index_name_from_path(path) == expected


@pytest.mark.parametrize("path,expected", INLINE, ids=range(len(INLINE)))
def test_inline(path, expected):
    assert index_name_from_path(path) == expected


def test_helpers():
    # index_name.rs:25-32, :110-117
    assert _is_hexadecimal("015da2b")
    assert not _is_hexadecimal("abcda2z")
    assert _remove_non_vowel_component("test-fdskl-test") == "test-test"
